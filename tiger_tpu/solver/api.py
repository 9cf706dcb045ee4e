"""Two-phase solve: RK45 over all systems, then Radau IIA over the stiff subset.

TPU-native analog of the reference host orchestration
(src/solver/rk45_api.hpp:159-313): the RK45 phase runs jitted over the whole
batch; stiff flags are pulled to the host, compacted into a dense index list
(padded to a small set of bucket sizes to bound recompilation), and the Radau
phase re-integrates just that subset from t0, overwriting its final states and
dense rows.  The reference does the same gather on the CPU
(rk45_api.hpp:190-203) before launching the Radau kernel over n_stiff threads.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tiger_tpu.forcing import ForcingSet
from tiger_tpu.solver.config import SolverConfig
from tiger_tpu.solver.controller import initial_step
from tiger_tpu.solver.radau import RadauStats, radau_solve
from tiger_tpu.solver.rk45 import RKStats, rk45_solve


class SolveResult(NamedTuple):
    y_final: jax.Array  # [S, N]
    dense: jax.Array  # [S, Q, N]
    stiff: jax.Array  # [S] bool — went through the Radau phase
    failed: jax.Array  # [S] bool — did not finish in either phase
    rk_stats: RKStats
    radau_stats: Optional[RadauStats]
    n_stiff: int


def _bucket(n: int) -> int:
    """Round up to a power of two (min 8) so Radau recompiles O(log S) times."""
    b = 8
    while b < n:
        b *= 2
    return b


def solve(
    model,
    y0: jax.Array,
    t0,
    tf,
    query_times: Optional[jax.Array] = None,
    params=None,
    forcings: Optional[ForcingSet] = None,
    config: SolverConfig = SolverConfig(),
    mesh=None,
    backend: str = "auto",
) -> SolveResult:
    """Integrate ``y0[S, N]`` from t0 to tf with dense output at query_times.

    Mirrors the reference's clean entry ``run_rk45<Model>``
    (src/solver/rk45_api.hpp:273-313) including the stiff second pass.
    With ``mesh`` (a 1-D jax.sharding.Mesh) the RK45 phase is domain-
    decomposed over devices via shard_map; the (small) Radau stiff subset
    always runs single-device after host compaction.

    ``backend``: 'auto' (fused Pallas kernel for float32 batches on TPU —
    order-of-magnitude faster; XLA/vmap otherwise), 'pallas', or 'xla'.
    """
    y0 = jnp.asarray(y0)
    h0 = initial_step(model, y0, t0, params, forcings, config)
    use_pallas = backend == "pallas" or (
        backend == "auto"
        and mesh is None
        and y0.dtype == jnp.float32
        and jax.devices()[0].platform == "tpu"
        and hasattr(model, "rhs_tuple")
    )
    if use_pallas:
        from tiger_tpu.kernels.rk45_pallas import rk45_solve_pallas

        rk = rk45_solve_pallas(
            model, y0, t0, tf, query_times, params, forcings, h0, config
        )
    elif mesh is not None:
        from tiger_tpu.dist import rk45_solve_sharded

        rk = rk45_solve_sharded(
            model, y0, t0, tf, query_times, params, forcings, h0, config, mesh
        )
    else:
        rk = rk45_solve(model, y0, t0, tf, query_times, params, forcings, h0, config)

    stiff_mask = np.asarray(rk.stiff)
    n_stiff = int(stiff_mask.sum())
    y_final, dense = rk.y_final, rk.dense
    radau_stats = None
    if n_stiff > 0:
        idx = np.nonzero(stiff_mask)[0]
        bucket = _bucket(n_stiff)
        pad_idx = np.concatenate([idx, np.full(bucket - n_stiff, idx[0], idx.dtype)])
        y0_sub = y0[pad_idx]
        params_sub = None if params is None else jax.tree.map(lambda a: a[pad_idx], params)
        forc_sub = None
        if forcings is not None:
            forc_sub = ForcingSet(data=forcings.data[:, pad_idx], meta=forcings.meta)
        rd = radau_solve(
            model,
            y0_sub,
            t0,
            tf,
            query_times,
            params_sub,
            forc_sub,
            h0=rk.h0[pad_idx],
            config=config,
        )
        y_final = y_final.at[idx].set(rd.y_final[:n_stiff])
        dense = dense.at[idx].set(rd.dense[:n_stiff])
        failed = rk.failed & ~rk.stiff
        failed = failed.at[idx].set(rd.failed[:n_stiff])
        radau_stats = rd.stats
    else:
        failed = rk.failed

    return SolveResult(
        y_final=y_final,
        dense=dense,
        stiff=rk.stiff,
        failed=failed,
        rk_stats=rk.stats,
        radau_stats=radau_stats,
        n_stiff=n_stiff,
    )
