"""Worker for test_global_mesh_stiff — launched TWICE under jax.distributed.

Builds a cross-process GLOBAL mesh (one CPU device per process), solves a
batch with genuinely stiff lanes through api.solve, and checks the stiff
phase resolves them (previously a NotImplementedError: the host compaction
could not read non-addressable shards).  Also compares against a local
single-device solve of the same batch.
"""

import sys

import numpy as np


def main() -> int:
    coord, pid = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, ".")
    from tests.test_solve_device_rung import StiffMix
    from tiger_tpu.solver import SolverConfig
    from tiger_tpu.solver.api import _host_pull, solve

    devs = np.array(jax.devices())
    assert len(devs) == 2 and not all(
        d.process_index == pid for d in devs
    ), "expected a cross-process global mesh"
    mesh = Mesh(devs, ("systems",))

    s = 8
    lam = np.full(s, -0.1, np.float32)
    lam[[2, 5]] = -1e6  # one stiff lane per shard
    y0_np = np.ones((s, 5), np.float32)
    sh = NamedSharding(mesh, P("systems"))
    y0 = jax.device_put(jnp.asarray(y0_np), sh)
    params = {"lam": jax.device_put(jnp.asarray(lam), sh)}
    cfg = SolverConfig(rtol=1e-5, atol=1e-8)

    res = solve(
        StiffMix(), y0, 0.0, 50.0, None, params, config=cfg, mesh=mesh,
        backend="xla",
    )
    stiff = _host_pull(res.stiff)
    failed = _host_pull(res.failed)
    yf = _host_pull(res.y_final)
    assert stiff[[2, 5]].all() and stiff.sum() == 2, stiff
    assert not failed.any(), failed
    assert np.isfinite(yf).all()

    # Local single-device reference of the same batch.
    ref = solve(
        StiffMix(), jnp.asarray(y0_np), 0.0, 50.0, None,
        {"lam": jnp.asarray(lam)}, config=cfg,
    )
    np.testing.assert_allclose(
        yf, np.asarray(ref.y_final), rtol=2e-5, atol=1e-7
    )
    print(f"proc {pid}: global-mesh stiff OK; yf[2,0]={yf[2, 0]:.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
