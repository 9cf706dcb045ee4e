"""Weak-scaling harness: systems/s efficiency from 1 to N shards.

North-star target (BASELINE.json): >= 90% weak-scaling efficiency on
systems/s from 1 host to N hosts.  On real multi-host hardware run this under
``jax.distributed``; without a pod slice it measures the shard_map path over
however many devices exist (or virtual CPU devices via
XLA_FLAGS=--xla_force_host_platform_device_count=8, which validates the
scaling SHAPE, not absolute time).

Usage:  python benchmarks/weak_scaling.py [--per-shard 4096] [--days 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--per-shard", type=int, default=4096)
    p.add_argument("--days", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"],
                   help="pallas = fused kernel per shard (TPU)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _scenario
    from tiger_tpu.dist import rk45_solve_sharded, systems_mesh
    from tiger_tpu.models import Model204
    from tiger_tpu.solver.config import SolverConfig

    devs = jax.devices()
    config = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=100_000)
    tf = args.days * 1440.0
    results = []
    n = 1
    while n <= len(devs):
        s_count = args.per_shard * n
        y0, params, forcings = _scenario(s_count, jnp.float32)
        h0 = jnp.full((s_count,), 1e-3, jnp.float32)
        mesh = systems_mesh(devs[:n])

        def once(eps):
            res = rk45_solve_sharded(
                Model204(), y0 + eps, 0.0, tf, None, params, forcings,
                h0=h0, config=config, mesh=mesh, backend=args.backend,
            )
            float(jnp.nansum(res.y_final))
            return res

        res = once(0.0)  # compile
        walls = []
        for i in (1, 2, 3):
            t = time.perf_counter()
            res = once(i * 1e-7)
            walls.append(time.perf_counter() - t)
        wall = float(np.median(walls))
        att = int(np.asarray(res.stats.n_attempts).sum())
        results.append(
            {"devices": n, "systems": s_count, "wall_s": wall, "steps_per_s": att / wall}
        )
        n *= 2

    base = results[0]["steps_per_s"]
    for r in results:
        r["efficiency"] = r["steps_per_s"] / (base * r["devices"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
