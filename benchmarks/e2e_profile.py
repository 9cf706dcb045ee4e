"""Phase breakdown of the end-to-end solve() path at large S.

Times each stage of the two-phase orchestration (solver/api.py) separately —
initial_step, RK45 kernel, stiff-count sync, device-Radau rung, CPU f64
retry, merges — so the gap between kernel time and solve() wall time is
attributable.  Prints one JSON line with per-phase seconds.

Usage: python benchmarks/e2e_profile.py [--systems 1048576] [--days 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--systems", type=int, default=1_048_576)
    p.add_argument("--days", type=float, default=2.0)
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    # Phase attribution is this tool's whole point; solver/api.py's
    # _phase_mark is a no-op without the env hook (it would otherwise
    # serialize production runs with per-phase syncs).
    os.environ.setdefault("TT_PHASE_PROFILE", "1")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tiger_tpu.profiling import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _scenario
    from tiger_tpu.models import Model204
    from tiger_tpu.solver import solve
    from tiger_tpu.solver.api import _phase_times
    from tiger_tpu.solver.config import SolverConfig

    s_count = args.systems
    tf = args.days * 1440.0
    model = Model204()
    config = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=100_000)
    y0, params, forcings = _scenario(s_count, jnp.float32)
    qt = jnp.arange(0.0, tf + 1e-9, 60.0, dtype=jnp.float32)

    results = []
    for i in range(args.repeat + 1):  # first iteration = compile
        _phase_times.clear()
        t_a = time.perf_counter()
        res = solve(model, y0 + i * 1e-6, 0.0, tf, qt, params, forcings,
                    config=config)
        jax.block_until_ready(res.y_final)
        jax.block_until_ready(res.dense)
        wall = time.perf_counter() - t_a
        rec = {"wall_s": round(wall, 3), "n_stiff": res.n_stiff,
               "phases": {k: round(v, 3) for k, v in _phase_times.items()}}
        results.append(rec)

    print(json.dumps({
        "metric": "e2e_solve_wall",
        "systems": s_count,
        "compile_run": results[0],
        "steady": results[1:],
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
