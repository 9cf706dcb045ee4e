"""Pallas TPU kernel: fused batched adaptive RK45 integration.

One `pallas_call` runs the ENTIRE t0->tf adaptive integration for a tile of
systems with all state resident in VMEM:

  - tile = (up to 32 sublanes x 128 lanes) = up to 4096 systems, auto-sized
    to the VMEM budget (_pick_tile_rows);
  - the adaptive loop is a `lax.while_loop` whose carry (t, h, y, stage
    slopes, dense buffer, per-lane counters) never round-trips HBM — the
    XLA/vmap path re-reads and re-writes its loop carry from HBM every
    attempted step, which is the dominant cost at large batch;
  - each grid step (tile) terminates as soon as ITS lanes are done, so one
    pathological system only stalls its own 1024-lane tile instead of the
    whole batch (the vmap path iterates everyone until the global laggard
    finishes);
  - forcing zero-order-hold gather is an in-VMEM masked select over the
    (static) per-forcing time steps; dense output fills only the query rows
    inside the tile's live window [q_lo, q_hi), maintained from per-tile
    min(t) / max(t+h) — queries the whole tile has passed are never touched
    again.

Numerics are IDENTICAL to tiger_tpu.solver.rk45 (same tableau module, same
controller/flag logic); `test_pallas_kernel.py` asserts step-for-step
agreement with the vmap path.  The kernel is float32 (the TPU performance
path); float64 parity runs use the vmap path.

Reference analog: rk45_then_radau_multi (src/solver/rk45_kernel.cu:17-176) —
one CUDA thread per system becomes one VPU lane per system, with the tile
playing the role of a threadblock whose "divergence" is masked-lane compute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiger_tpu.forcing import ForcingSet, ForcingMeta
from tiger_tpu.solver import tableau
from tiger_tpu.solver.config import SolverConfig
from tiger_tpu.solver.rk45 import RK45Result, RKStats

LANES = 128
# Tile sizes considered by _pick_tile_rows: 32 rows = 4096 systems/tile max.
# TT_VMEM_BUDGET (bytes) overrides for tile-size experiments.
import os as _os

_VMEM_BUDGET = int(_os.environ.get("TT_VMEM_BUDGET", 10 * 2**20))  # ~16 MB/core VMEM


def _per_lane_bytes(qp: int, n_eq: int, t_forc: int, n_params: int,
                    f_bytes: int = 4) -> int:
    """VMEM bytes per lane: double-buffered dense block, forcing block,
    params, and ~74 live f32 values (carries incl. the stiffness-detector
    counters, 7 stages, temporaries).  ONE source of truth for the planner
    and its tests."""
    return 4 * (2 * qp * n_eq + n_params + 74) + f_bytes * t_forc


def _pick_tile_rows(
    q_total: int, n_eq: int, t_forc: int, n_params: int, f_bytes: int = 4
) -> Optional[int]:
    """Largest tile (rows of 128 lanes) whose working set fits VMEM.

    Per lane: dense block (qp * n_eq, counted TWICE — Pallas double-buffers
    the output block across grid steps, which is what the hardware scoped-
    vmem accounting sees), forcing block, params, and ~70 f32 live values
    (carries, 7 stages, temporaries).  Bigger tiles amortize the while-loop
    overhead across more lanes: 8 -> 32 rows measured 2.3x on the 2-day
    Model-204 bench.  Returns None when even an 8-row tile cannot hold the
    dense block — the pipeline then auto-windows the queries
    (_query_window_size) instead of handing Mosaic an over-budget kernel.
    """
    per_lane = _per_lane_bytes(max(q_total, 1), n_eq, t_forc, n_params, f_bytes)
    for rows in _tile_row_candidates():
        if per_lane * rows * LANES <= _VMEM_BUDGET:
            return rows
    return None


def _tile_row_candidates() -> tuple:
    """Tile heights to try, biggest first (TT_TILE_ROWS env pins one for
    perf experiments)."""
    import os

    override = int(os.environ.get("TT_TILE_ROWS", "0"))
    return (override,) if override else (64, 32, 16, 8)


def _query_window_size(
    n_eq: int, t_forc: int, n_params: int, rows: int = 8, f_bytes: int = 4
) -> int:
    """Max queries per window so an ``rows``-row tile fits the VMEM budget.

    May return <= 0: the forcing/params working set alone can exceed the
    budget (callers must treat that as infeasible, not clamp it — a clamped
    1 here once made _plan_tiles' 'stream the time dimension' error
    unreachable and produced obscure Mosaic OOMs instead)."""
    per_lane_budget = _VMEM_BUDGET // (rows * LANES)
    return int(
        (per_lane_budget - f_bytes * t_forc - 4 * (n_params + 70)) // (4 * 2 * n_eq)
    )


def _plan_tiles(s_count, q_total, n_eq, t_forc, n_params, f_bytes: int = 4):
    """Pick (tile_rows, q_chunk|None): BIGGEST tile first, windowing queries
    if that is what it takes.

    The kernel is latency-bound on its dependent op chain (DESIGN.md
    roofline): every vector op on an (R, 128) value issues R/8 independent
    vreg instructions, so taller tiles hide more latency — measured 2.3x
    going 8->32 rows and +42% going 32->64 (by windowing the dense buffer:
    349M -> 496M steps/s on the v5e bench).  Windowing costs one clamped
    step per boundary, which is noise for q_chunk >= 8.
    """
    candidates = _tile_row_candidates()
    cap = 8
    while cap < 64 and cap * LANES < s_count:
        cap *= 2
    if len(candidates) == 1:
        cap = max(cap, candidates[0])  # TT_TILE_ROWS pins the size outright
    import os as _os

    qc_env = int(_os.environ.get("TT_RK45_QCHUNK", "0"))
    if qc_env > 0 and q_total > qc_env:
        # Forced query windowing (perf experiment): windows also RESYNC the
        # tile's lanes at each boundary, shrinking the dense fill's live
        # query span — see DESIGN.md round-5 dense-fill notes.
        return min(cap, candidates[0]), qc_env
    per_lane = _per_lane_bytes(max(q_total, 1), n_eq, t_forc, n_params, f_bytes)
    for rows in candidates:
        if rows > cap:
            continue
        if per_lane * rows * LANES <= _VMEM_BUDGET:
            return rows, None
        qc = _query_window_size(n_eq, t_forc, n_params, rows, f_bytes)
        if q_total > 0 and qc >= 8:
            return rows, qc
    rows = candidates[-1]
    if q_total > 0:
        qc = _query_window_size(n_eq, t_forc, n_params, rows, f_bytes)
        if qc >= 1:
            return rows, qc
    raise ValueError(
        f"forcing/params working set alone exceeds the kernel VMEM budget "
        f"(t_forc={t_forc}, n_params={n_params}); stream the time dimension "
        "with tiger_tpu.chunked.solve_chunked"
    )


class _Carry(NamedTuple):
    alive: jax.Array  # scalar i32: any lane still active (while-cond operand;
    #                   Mosaic rejects vector reductions inside the cond)
    t: jax.Array  # (R, 128)
    t_c: jax.Array  # Kahan compensation for t: f32 t += h over ~1e3 steps
    #                 otherwise drifts ~1e2 ulps, skewing forcing/dense windows
    h: jax.Array
    y: tuple  # N_EQ arrays of (R, 128) — kept 2-D; Mosaic dislikes 3-D vectors
    k0: tuple  # FSAL carry: rhs(t, y) per lane (empty tuple when fsal off)
    reject: jax.Array  # (R, 128) int32
    facold: tuple  # PI-controller state: last accepted error norm, as a
    #                1-tuple of (R, 128); empty tuple when controller='i'
    stiff: jax.Array  # (R, 128) int32 (0/1: Mosaic rejects i1 vector carries)
    det: tuple  # Hairer stiffness-detector counters (iasti, nonsti) as
    #             (R, 128) i32 pairs; empty tuple when cfg.stiff_detect off
    fstreak: tuple  # 1-tuple of (R, 128) i32: consecutive attempts with the
    #                 carried h below the collapse floor (stiff_floor_streak
    #                 criterion); empty tuple when cfg.stiff_detect off
    y_c: tuple  # Kahan compensation of y, N_EQ arrays of (R, 128); empty
    #             tuple unless cfg.compensated (tight-tolerance f32 path)
    n_acc: jax.Array
    n_rej: jax.Array
    n_att: jax.Array
    qcur: tuple  # 1-tuple of scalar i32: tile-uniform next-unfilled-query
    #              cursor (cfg.dense_lockstep; empty tuple otherwise) — the
    #              barrier that keeps the dense fill's union window ~1 wide


def _gather_forcings(forc_ref, meta: ForcingMeta, t, dtype, t_min=None, t_max=None,
                     snap: float = 0.0):
    """ZOH gather for every lane: tuple of (R, 128) forcing values at time t.

    Lanes in a tile sit at similar times, so instead of scanning all n_t time
    steps we loop only over the tile's live index window [min(idx), max(idx)]
    — almost always 1-2 iterations (adaptive steps are minutes, forcing steps
    are hours).  Callers that already reduced the tile's t-range pass
    ``t_min``/``t_max`` so each forcing derives its window arithmetically
    instead of re-reducing.  ``snap``: forcing.ZOH_SNAP under
    forcing_step_align, else 0 (raw reference indexing).
    """
    if t_min is None:
        t_min = jnp.min(t)
        t_max = jnp.max(t)
    vals = []
    for off, n_t, dt in zip(meta.offsets, meta.n_steps, meta.dt_min):
        idx = jnp.clip((t / dt + snap).astype(jnp.int32), 0, n_t - 1)
        k_lo = jnp.clip((t_min / dt + snap).astype(jnp.int32), 0, n_t - 1)
        k_hi = jnp.clip((t_max / dt + snap).astype(jnp.int32), 0, n_t - 1)

        def body(k, acc):
            row = forc_ref[off + k]  # (R, 128) float32
            return jnp.where(idx == k, row.astype(dtype), acc)

        vals.append(lax.fori_loop(k_lo, k_hi + 1, body, jnp.zeros_like(t)))
    return tuple(vals)


def _zoh_step_cap(meta: ForcingMeta, t, h_eff):
    """Kernel twin of forcing.zoh_step_cap: clamp h_eff at the next ZOH
    sample boundary (same snapped index as the gather; no boundaries past
    each record's end)."""
    from tiger_tpu.forcing import ZOH_SNAP

    for n_t, dt in sorted(set(zip(meta.n_steps, meta.dt_min))):
        k = jnp.floor(t / dt + ZOH_SNAP)
        nb = (k + 1.0) * dt - t
        nb = jnp.where(k + 1.0 >= n_t, jnp.asarray(jnp.inf, t.dtype), nb)
        h_eff = jnp.minimum(h_eff, nb)
    return h_eff


def _make_kernel(model, param_fields, meta, t0, tf, n_eq, q_total, cfg: SolverConfig):
    # Static GLOBAL span: the stiffness criterion h < span*min_step_fraction
    # (rk45_kernel.cu:167-170) always uses the full-run span, even when the
    # pipeline windows queries and each call integrates a sub-interval.
    span = tf - t0

    from tiger_tpu.forcing import ZOH_SNAP

    snap = ZOH_SNAP if (cfg.forcing_step_align and meta is not None) else 0.0

    dp_a, dp_c = tableau.DP_A, tableau.DP_C
    dp_b = tableau.DP_B
    dp_e = tableau.DP_E
    dp_p = tableau.DP_P

    def kernel(bounds_smem, qt_smem, qt_ref, y0_ref, h0_ref, params_ref, forc_ref,
               yf_ref, dense_ref, stiff_ref, stats_ref, hout_ref, *scratch):
        # FSAL-only VMEM scratch for the k1 carry refresh: pl.when branches
        # communicate through ref stores, not values, so the refreshed slopes
        # are staged here (allocated only when cfg.fsal).
        k0_scr = scratch[0] if cfg.fsal else None
        dtype = y0_ref.dtype
        # Window bounds are DYNAMIC scalars (SMEM) so the query-windowed
        # pipeline can lax.scan one compiled kernel over sub-intervals;
        # unwindowed calls pass (t0, tf).
        t0_s = bounds_smem[0, 0]
        tf_s = bounds_smem[0, 1]
        # Absolute-time shift for the MODEL rhs only (chunked runs integrate
        # window-relative time; Model 200's day-of-year needs absolute t).
        # Forcing gathers stay window-relative by design.
        shift_s = bounds_smem[0, 2]
        y0 = tuple(y0_ref[i] for i in range(n_eq))  # N x (R, 128)
        qt2 = qt_ref[...] if q_total > 0 else None  # (1, Qp) value, reductions
        r = y0[0].shape[0]
        shp = (r, LANES)
        i32 = jnp.int32

        # Params are read once and loop-invariant derived quantities (e.g.
        # the Manning coefficient, reciprocal storages) are hoisted out of
        # the while-loop: the RHS runs 7x per attempted step and divides/
        # sqrt are the expensive VPU ops.
        p_base = {name: params_ref[i] for i, name in enumerate(param_fields)}
        if param_fields and hasattr(model, "derived_params"):
            p_base = model.derived_params(p_base)

        def rhs(t, y, f_vals):
            # model.rhs_tuple consumes indexables of (R,128) blocks: every
            # "scalar" in the physics is a lane vector and vectorizes on the
            # VPU without any stacking.
            return model.rhs_tuple(t + shift_s, y, p_base, f_vals)

        # Dense buffer lives in the OUTPUT ref (VMEM): the fill loop needs
        # dynamically-indexed row reads/writes, which Mosaic supports on refs
        # but not on loop-carry values.  Rows with qt <= t0 prefill with y0
        # (fill_t0_queries); everything else zeros.  Row-at-a-time 2-D writes.
        if q_total > 0 and cfg.fill_t0_queries:
            n_pre = jnp.sum((qt2 <= t0_s).astype(i32))
        else:
            n_pre = jnp.zeros((), i32)
        zero2d = jnp.zeros(shp, dtype)

        def init_row(qi, _):
            pre = qi < n_pre
            for ci in range(n_eq):
                dense_ref[qi, ci] = jnp.where(pre, y0[ci], zero2d)
            return 0

        lax.fori_loop(0, max(q_total, 1), init_row, 0)

        # Carries must be initialized VARYING (derived from ref data), not as
        # splat constants: Mosaic assigns splats a replicated layout, and once
        # a y-dependent mask makes the carry varying the loop back-edge would
        # need an (illegal) varying->replicated relayout.
        vz = y0[0] * 0.0
        vzi = vz.astype(i32)
        if cfg.fsal:
            f0 = None
            if meta is not None:
                f0 = _gather_forcings(forc_ref, meta, vz + t0_s, dtype, snap=snap)
            k0_init = rhs(vz + t0_s, y0, f0)
        else:
            k0_init = ()
        carry0 = _Carry(
            alive=jnp.ones((), i32),
            t=vz + t0_s,
            t_c=vz,
            h=h0_ref[1],  # row 1 = current step size (carried across windows)
            # (stiff below: row 2 = stiff flags carried across windows — a
            # lane flagged in window k must not re-integrate from NaN state
            # in every later window, burning ~max_rejects attempts each.
            # row 3 = PI-controller facold, likewise carried so the windowed
            # step sequence matches the unwindowed kernel and the vmap path.)
            y=y0,
            k0=tuple(k0_init),
            reject=vzi,
            facold=((h0_ref[3],) if cfg.controller == "pi" else ()),
            stiff=h0_ref[2].astype(i32) + vzi,
            # rows 4/5 = Hairer detector counters, carried across windows so
            # a cruise straddling a window boundary still accumulates;
            # row 6 = below-collapse-floor attempt streak, likewise carried.
            det=(
                (h0_ref[4].astype(i32) + vzi, h0_ref[5].astype(i32) + vzi)
                if cfg.stiff_detect
                else ()
            ),
            fstreak=(
                (h0_ref[6].astype(i32) + vzi,) if cfg.stiff_detect else ()
            ),
            # rows 7..7+N = Kahan y compensation, carried across windows.
            y_c=(
                tuple(h0_ref[7 + i] + vz for i in range(n_eq))
                if cfg.compensated
                else ()
            ),
            n_acc=vzi,
            n_rej=vzi,
            n_att=vzi,
            # Lockstep cursor starts at the first query strictly past t0
            # (queries <= t0 are prefilled, never step-filled).
            qcur=(
                (jnp.sum((qt2 <= t0_s).astype(i32)),)
                if (cfg.dense_lockstep and q_total > 0)
                else ()
            ),
        )

        def cond(c):
            return c.alive > 0

        # TT_RK45_TREE=1: reassociate the stage/b-row/e-row/P-row
        # accumulations as balanced pairwise trees instead of serial fma
        # chains — an ILP experiment (round-5 verdict item: the kernel is
        # latency-bound on its dependent chain).  Trace-time static; changes
        # results by rounding only (reassociation).
        import os as _os

        tree_acc = _os.environ.get("TT_RK45_TREE", "") not in ("", "0")
        # TT_RK45_FILLGATE=1: tile-gate the dense qm+fill block on a
        # non-empty live query window (perf experiment; see dense section).
        _fill_gate = _os.environ.get("TT_RK45_FILLGATE", "") not in ("", "0")

        def _tree_sum(terms):
            """Balanced pairwise sum: chain depth log2(n) instead of n."""
            terms = list(terms)
            while len(terms) > 1:
                nxt = [
                    terms[k] + terms[k + 1]
                    for k in range(0, len(terms) - 1, 2)
                ]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            return terms[0]

        def body(c):
            # Mask algebra in i32 (0/1): Mosaic miscompiles the AND of two
            # f32-derived i1 masks ("Invalid relayout ... replicated"), so
            # masks are multiplied as integers and selects compare to 0.
            def b2i(m):
                return m.astype(i32)

            act_i = (
                b2i(c.t < tf_s) * b2i(c.stiff == 0) * b2i(c.n_att < cfg.max_steps)
            )
            lockstep = cfg.dense_lockstep and q_total > 0
            if lockstep:
                # Lockstep query crossing (SolverConfig.dense_lockstep):
                # advance the tile-uniform cursor when every active lane
                # has reached the current barrier query (f32 landing
                # tolerance: the Kahan commit can stop an ulp short), then
                # BARRIER this iteration's stepping at the new one — lanes
                # at the barrier idle (masked inactive) until all arrive,
                # so the dense fill's union window never exceeds ~1 query.
                qcap = q_total - 1
                tqn0 = qt_smem[0, jnp.minimum(c.qcur[0], qcap)]
                tol0 = 4.8e-7 * jnp.abs(tqn0) + 1e-6
                not_arr = act_i * b2i(c.t < tqn0 - tol0)
                adv = (1 - jnp.max(not_arr)) * b2i(c.qcur[0] < q_total)
                q_cur = c.qcur[0] + adv
                tq_next = qt_smem[0, jnp.minimum(q_cur, qcap)]
                barrier = jnp.where(
                    q_cur < q_total, tq_next, tf_s + 1.0
                )
                tolb = 4.8e-7 * jnp.abs(barrier) + 1e-6
                wait_i = act_i * b2i(c.t >= barrier - tolb)
                act_i = act_i * (1 - wait_i)
            t, y = c.t, c.y
            clamp_i = b2i(t + c.h > tf_s)
            h_eff = jnp.where(clamp_i > 0, tf_s - t, c.h)
            if lockstep:
                # Cap stepping lanes at the barrier (same committed-h
                # semantics as the ZOH cap below: the controller's next h
                # grows from the capped value).
                h_eff = jnp.minimum(h_eff, jnp.maximum(barrier - t, 0.0))
            if snap:
                # ZOH boundary alignment (SolverConfig.forcing_step_align).
                h_eff = _zoh_step_cap(meta, t, h_eff)

            f_vals = None
            t_act_min = t_act_hi = None
            if meta is not None:
                # Range-reduce over ACTIVE lanes only: a lane stiff-flagged
                # early freezes its t forever, and an unmasked min would make
                # the gather's index window span from that stale time to the
                # live lanes' current one — O(n_t) row scans per step for the
                # tile's whole remaining run.
                t_act_min = jnp.min(jnp.where(act_i > 0, t, tf_s))
                t_act_max = jnp.max(jnp.where(act_i > 0, t, t0_s))
                t_act_hi = t_act_max
                if cfg.fsal:
                    # Stage times reach t + h: widen the gather index window.
                    t_act_hi = t_act_max + jnp.max(
                        jnp.where(act_i > 0, h_eff, 0.0)
                    )
                f_vals = _gather_forcings(
                    forc_ref, meta, t, dtype, t_act_min, t_act_hi, snap=snap
                )

            # FSAL: k1 comes from the carry (advanced lanes took last step's
            # k7; rejected lanes' (t, y) are unchanged so theirs is current).
            # Forcing is frozen at step-start t for EVERY stage (reference
            # parity, rk45_kernel.cu:84-116) — freezing keeps each step's RHS
            # smooth, so steps stride ZOH kinks without rejection storms; the
            # carry staleness this creates at boundary crossings is repaired
            # below (see the pl.when refresh), making FSAL bit-identical to
            # the non-FSAL kernel.
            k0 = c.k0 if cfg.fsal else rhs(t, y, f_vals)
            ks = [k0]
            g6 = y  # stage-6 argument (captured below; Hairer hlamb test)
            for s in range(1, 7):
                if tree_acc:
                    acc = [
                        _tree_sum(
                            [y[i]]
                            + [
                                (h_eff * float(dp_a[s, j])) * ks[j][i]
                                for j in range(s)
                                if dp_a[s, j] != 0.0
                            ]
                        )
                        for i in range(n_eq)
                    ]
                else:
                    acc = list(y)
                    for j in range(s):
                        if dp_a[s, j] != 0.0:
                            # float(): weak-typed so f32 stays f32 under x64.
                            w = float(dp_a[s, j])
                            acc = [
                                acc[i] + (h_eff * w) * ks[j][i]
                                for i in range(n_eq)
                            ]
                if s == 5:
                    g6 = tuple(acc)
                ks.append(rhs(t + float(dp_c[s]) * h_eff, tuple(acc), f_vals))

            if tree_acc:
                err_c = [
                    _tree_sum(
                        [
                            (h_eff * float(dp_e[s])) * ks[s][i]
                            for s in range(7)
                            if dp_e[s] != 0.0
                        ]
                    )
                    for i in range(n_eq)
                ]
                if cfg.compensated:
                    # Kahan commit needs the exact addend dy.
                    dys = [
                        _tree_sum(
                            [
                                (h_eff * float(dp_b[s])) * ks[s][i]
                                for s in range(7)
                                if dp_b[s] != 0.0
                            ]
                        )
                        for i in range(n_eq)
                    ]
                    y_out = [y[i] + dys[i] for i in range(n_eq)]
                else:
                    # Same association as stage 7's input (b-row == a7-row,
                    # FSAL property): keeps k7 == next step's k1 bit-exact,
                    # so cfg.fsal stays bit-identical under reassociation.
                    y_out = [
                        _tree_sum(
                            [y[i]]
                            + [
                                (h_eff * float(dp_b[s])) * ks[s][i]
                                for s in range(7)
                                if dp_b[s] != 0.0
                            ]
                        )
                        for i in range(n_eq)
                    ]
            else:
                err_c = [jnp.zeros(shp, dtype) for _ in range(n_eq)]
                if cfg.compensated:
                    # dy accumulated separately (matching the vmap path's
                    # tensordot-then-add) so the Kahan commit below sees the
                    # exact addend; y_out = y + dy drives the error test.
                    dys = [jnp.zeros(shp, dtype) for _ in range(n_eq)]
                else:
                    y_out = list(y)
                for s in range(7):
                    if dp_b[s] != 0.0:
                        w = float(dp_b[s])
                        if cfg.compensated:
                            dys = [
                                dys[i] + (h_eff * w) * ks[s][i]
                                for i in range(n_eq)
                            ]
                        else:
                            y_out = [
                                y_out[i] + (h_eff * w) * ks[s][i]
                                for i in range(n_eq)
                            ]
                    if dp_e[s] != 0.0:
                        w = float(dp_e[s])
                        err_c = [
                            err_c[i] + (h_eff * w) * ks[s][i]
                            for i in range(n_eq)
                        ]
                if cfg.compensated:
                    y_out = [y[i] + dys[i] for i in range(n_eq)]
            err = jnp.zeros(shp, dtype)
            for i in range(n_eq):
                tol = cfg.atol + cfg.rtol * jnp.maximum(jnp.abs(y[i]), jnp.abs(y_out[i]))
                err = jnp.maximum(err, jnp.abs(err_c[i] / tol))

            accept_i = b2i(err <= 1.0)
            jump_mag = jnp.zeros(shp, dtype)
            for i in range(n_eq):
                jump_mag = jnp.maximum(jump_mag, jnp.abs(ks[0][i] - ks[1][i]))
            jump_i = b2i(jump_mag > cfg.slope_jump_thresh)
            advance_i = act_i * accept_i * (1 - jump_i)
            slope_i = act_i * accept_i * jump_i
            rejected_i = act_i * (1 - accept_i)

            # Kahan-compensated committed time.  Computed BEFORE the dense
            # fill and used as its upper bound: filling to t + h_eff while
            # committing t_new = t + (h_eff - t_c) would leave a ~1-ulp gap
            # (t + h_eff, t_new] of queries that are never filled — the next
            # step's ``tq > t`` test already excludes them.
            kh = h_eff - c.t_c
            ks_sum = t + kh

            # ---- dense output: live query window [q_lo, q_hi) ----
            if q_total > 0:
                t1 = ks_sum
                big = jnp.asarray(2.0 * abs(tf) + 1e30, dtype)
                min_t = jnp.min(jnp.where(act_i > 0, t, big))
                max_t1 = jnp.max(
                    jnp.where(advance_i > 0, t1, t0_s - 1.0)
                )
                q_lo = jnp.sum((qt2 < min_t).astype(i32))  # strictly passed
                q_hi = jnp.sum((qt2 <= max_t1).astype(i32))

                def _fill_block():
                    # The interpolant's 4 x N_EQ theta-monomial coefficients
                    # (7-term P-matrix combos, ~140 vector fma) are needed
                    # only when the window is non-empty — under the gate
                    # below they cost nothing on the (spread-dependent)
                    # fraction of iterations with no live query.
                    qm = [
                        [jnp.zeros(shp, dtype) for _ in range(n_eq)]
                        for _ in range(4)
                    ]
                    for m in range(4):
                        for j in range(7):
                            if dp_p[j, m] != 0.0:
                                w = float(dp_p[j, m])
                                for i in range(n_eq):
                                    qm[m][i] = qm[m][i] + w * ks[j][i]

                    def fill(qi, _):
                        tq = qt_smem[0, qi]  # scalar read, dyn index (SMEM)
                        pred_i = advance_i * b2i(tq > t) * b2i(tq <= t1)
                        pred = pred_i > 0
                        theta = jnp.where(pred, (tq - t) / h_eff, 0.0)
                        th2 = theta * theta
                        for ci in range(n_eq):
                            poly = (
                                qm[0][ci] * theta
                                + qm[1][ci] * th2
                                + qm[2][ci] * th2 * theta
                                + qm[3][ci] * th2 * th2
                            )
                            yd = y[ci] + h_eff * poly
                            dense_ref[qi, ci] = jnp.where(
                                pred, yd, dense_ref[qi, ci]
                            )
                        return 0

                    lax.fori_loop(q_lo, q_hi, fill, 0)

                if _fill_gate:
                    pl.when(q_hi > q_lo)(_fill_block)
                else:
                    _fill_block()

            if cfg.controller == "pi":
                # Lund-stabilized PI (see SolverConfig.controller): committed
                # steps credit the previous committed error; rejections and
                # discarded slope-cut attempts use the unstabilized factor,
                # mirroring solver/rk45.py.
                expo = 0.2 - cfg.pi_beta * 0.75
                base_fac = cfg.safety * (1.0 / (err + 1e-16)) ** expo
                raw_fac = base_fac * c.facold[0] ** cfg.pi_beta
                # Clamped landing steps (tf or a query-window boundary) don't
                # feed the stabilization state — their artificially small
                # error would floor facold and damp post-boundary growth
                # (solver/rk45.py has the same gate).
                facold_new = (
                    jnp.where(
                        advance_i * (1 - clamp_i) > 0,
                        jnp.maximum(err, 1e-4),
                        c.facold[0],
                    ),
                )
            else:
                base_fac = cfg.safety * (1.0 / (err + 1e-16)) ** 0.2
                raw_fac = base_fac
                facold_new = ()
            fac_acc = jnp.clip(raw_fac, cfg.min_scale, cfg.max_scale)
            fac_rej = jnp.where(
                jnp.isnan(base_fac), cfg.nan_shrink, jnp.minimum(base_fac, 1.0)
            )
            fac_rej = jnp.clip(fac_rej, cfg.min_scale, cfg.max_scale)

            h0_lane = h0_ref[0]
            h_slope = jnp.maximum(h_eff * 0.5, h0_lane * cfg.min_step_fraction)
            # Clamped landing steps never shrink the carried h below its
            # pre-clamp value — the next query window resumes at the natural
            # step size (solver/rk45.py has the same rule).
            h_adv = jnp.where(
                clamp_i > 0, jnp.maximum(h_eff * fac_acc, c.h), h_eff * fac_acc
            )
            h_new = jnp.where(
                advance_i > 0,
                h_adv,
                jnp.where(slope_i > 0, h_slope, h_eff * fac_rej),
            )
            reject_new = jnp.where(accept_i > 0, 0, c.reject + 1)
            h_floor = span * cfg.min_step_fraction
            if cfg.stiff_detect:
                # h-collapse = PERSISTENTLY below the span-proportional
                # floor (mirror of solver/rk45.py; see
                # SolverConfig.stiff_floor_streak) — the raw reference rule
                # flags every transient kink-resolution dip on long records.
                # Only ACTIVE attempts advance the streak (inactive lanes'
                # frozen h must not keep counting).
                fs1 = jnp.where(
                    act_i * b2i(h_new < h_floor) > 0, c.fstreak[0] + 1,
                    jnp.where(act_i > 0, 0, c.fstreak[0]),
                )
                stiff_new = jnp.maximum(
                    rejected_i * b2i(reject_new > cfg.max_rejects),
                    act_i * b2i(fs1 >= cfg.stiff_floor_streak),
                )
                fstreak_new = (fs1,)
            else:
                stiff_new = rejected_i * jnp.maximum(
                    b2i(reject_new > cfg.max_rejects),
                    b2i(h_new < h_floor),
                )
                fstreak_new = ()

            if cfg.stiff_detect:
                # Hairer stability-boundary detector (SolverConfig.stiff_*,
                # mirror of solver/rk45.py): |h*lambda| estimated from the
                # two t+h stages; stiff_streak consecutive TESTED committed
                # steps beyond stiff_hlamb flag the lane.  Catches
                # accept-cruisers pinned at the explicit stability limit
                # (err just under 1, never rejecting) that the reject-only
                # criteria above miss — one such lane otherwise dilates its
                # whole tile ~30x.
                stnum = jnp.zeros(shp, dtype)
                stden = jnp.zeros(shp, dtype)
                for i in range(n_eq):
                    stnum = jnp.maximum(stnum, jnp.abs(ks[6][i] - ks[5][i]))
                    stden = jnp.maximum(stden, jnp.abs(y_out[i] - g6[i]))
                hlamb = jnp.where(stden > 0, h_eff * stnum / stden, 0.0)
                # Test cadence (Hairer's NSTIFF): every stiff_test_every-th
                # accepted step; power-of-two so the mod is a bitwise AND.
                n_acc_i = c.n_acc + advance_i
                tested_i = advance_i * b2i(
                    (n_acc_i & (cfg.stiff_test_every - 1)) == 0
                )
                # Slope-cut attempts trip UNCADENCED (mirror of
                # solver/rk45.py: each cut is unambiguous stiffness evidence
                # and a throttling treadmill — h halved, step discarded).
                trip_i = jnp.maximum(
                    slope_i, tested_i * b2i(hlamb > cfg.stiff_hlamb)
                )
                calm_i = tested_i * (1 - b2i(hlamb > cfg.stiff_hlamb))
                iasti1 = jnp.where(trip_i > 0, c.det[0] + 1, c.det[0])
                nonsti1 = jnp.where(
                    trip_i > 0, 0, jnp.where(calm_i > 0, c.det[1] + 1, c.det[1])
                )
                iasti1 = jnp.where(
                    calm_i * b2i(nonsti1 >= cfg.stiff_forgive) > 0, 0, iasti1
                )
                stiff_new = jnp.maximum(
                    stiff_new, b2i(iasti1 >= cfg.stiff_streak)
                )
                det_new = (iasti1, nonsti1)
            else:
                det_new = ()

            # Kahan commit of t += h_eff on advancing lanes (kh/ks_sum above).
            tc_new = jnp.where(advance_i > 0, (ks_sum - t) - kh, c.t_c)
            t_new = jnp.where(advance_i > 0, ks_sum, t)
            stiff_acc = jnp.maximum(c.stiff, stiff_new)
            n_att_new = c.n_att + act_i
            still_i = (
                b2i(t_new < tf_s) * b2i(stiff_acc == 0) * b2i(n_att_new < cfg.max_steps)
            )
            if cfg.fsal:
                # k7 = rhs(t+h, y_out, f(t)) with the b-row == a7-row identity
                # of Dormand-Prince (the a7 and b accumulations share the same
                # nonzero sequence, so acc7 is bit-equal to y_out): exactly
                # the next step's k1 for advanced lanes — UNLESS the step
                # crossed a ZOH forcing boundary, in which case the next
                # step's frozen forcing f(t_new) differs from f(t) and the
                # carry would go stale.  A stale carry's one inconsistent
                # stage inflates the error estimate into rejection storms and
                # spurious stiff flags on small-magnitude states (measured
                # 8,468 bogus flags and +45% attempts on the 131k bench), so
                # crossing lanes refresh with one extra RHS eval — gated at
                # tile level (pl.when): crossings cluster at the shared
                # forcing boundaries, so most iterations skip the whole
                # block.  With the refresh, FSAL is bit-identical to the
                # non-FSAL kernel for every shipped model (stage 7's input is
                # bit-equal to y_out because DP's a7-row == b-row with the
                # same nonzero order; its forcing is made consistent here;
                # the only residual difference is the rhs t argument's Kahan
                # compensation, and no shipped rhs is t-sensitive below day
                # granularity) — a pure optimization, not an accuracy trade.
                t_new_v = jnp.where(advance_i > 0, ks_sum, t)
                y_new = tuple(
                    jnp.where(advance_i > 0, y_out[i], y[i]) for i in range(n_eq)
                )
                for i in range(n_eq):
                    k0_scr[i] = jnp.where(advance_i > 0, ks[6][i], c.k0[i])
                if meta is not None:
                    crossed = vzi
                    for n_t, dt in zip(meta.n_steps, meta.dt_min):
                        io = jnp.clip((t / dt + snap).astype(i32), 0, n_t - 1)
                        iw = jnp.clip((t_new_v / dt + snap).astype(i32), 0, n_t - 1)
                        crossed = jnp.maximum(crossed, b2i(io != iw))
                    crossed = crossed * advance_i

                    @pl.when(jnp.max(crossed) > 0)
                    def _refresh():
                        f_new = _gather_forcings(
                            forc_ref, meta, t_new_v, dtype, t_act_min, t_act_hi,
                            snap=snap,
                        )
                        fresh = rhs(t_new_v, y_new, f_new)
                        for i in range(n_eq):
                            k0_scr[i] = jnp.where(
                                crossed > 0, fresh[i], k0_scr[i]
                            )

                k0_new = tuple(k0_scr[i] for i in range(n_eq))
            else:
                k0_new = ()
            if cfg.compensated:
                # Kahan commit (mirror of solver/rk45.py): the carried low
                # word folds back into the addend; the error test above used
                # the plain y + dy.
                khs = [dys[i] - c.y_c[i] for i in range(n_eq)]
                y_kah = [y[i] + khs[i] for i in range(n_eq)]
                y_next = tuple(
                    jnp.where(advance_i > 0, y_kah[i], y[i]) for i in range(n_eq)
                )
                y_c_new = tuple(
                    jnp.where(
                        advance_i > 0, (y_kah[i] - y[i]) - khs[i], c.y_c[i]
                    )
                    for i in range(n_eq)
                )
            else:
                y_next = tuple(
                    jnp.where(advance_i > 0, y_out[i], y[i]) for i in range(n_eq)
                )
                y_c_new = ()
            return _Carry(
                alive=jnp.max(still_i),
                t=t_new,
                t_c=tc_new,
                h=jnp.where(act_i > 0, h_new, c.h),
                y=y_next,
                k0=k0_new,
                reject=jnp.where(act_i > 0, reject_new, c.reject),
                facold=facold_new,
                stiff=stiff_acc,
                det=det_new,
                fstreak=fstreak_new,
                y_c=y_c_new,
                n_acc=c.n_acc + advance_i,
                n_rej=c.n_rej + rejected_i,
                n_att=n_att_new,
                qcur=((q_cur,) if lockstep else ()),
            )

        out = lax.while_loop(cond, body, carry0)

        completed = out.t >= tf_s
        nan = jnp.asarray(jnp.nan, dtype)
        for ci in range(n_eq):
            yf_ref[ci] = jnp.where(completed, out.y[ci], nan)
        # Same contract as the vmap path (solver/rk45.py:259-261): lanes that
        # hit max_steps without tripping the stiffness criteria report
        # failed=1 AND stiff=1 (they go to the Radau pass too); criteria-stiff
        # lanes report failed=0.
        notc_i = (out.t < tf_s).astype(i32)
        stiff_ref[0] = jnp.maximum(out.stiff, notc_i)
        stats_ref[0] = out.n_acc
        stats_ref[1] = out.n_rej
        stats_ref[2] = out.n_att
        stats_ref[3] = notc_i * (1 - out.stiff)
        hout_ref[0] = out.h
        # Row 1: PI facold, fed back as h0_ref row 3 by the window scan.
        hout_ref[1] = out.facold[0] if cfg.controller == "pi" else out.h * 0.0
        # Rows 2/3: detector counters, fed back as h0_ref rows 4/5 (exact in
        # f32: counts stay far below 2^24).
        zf = out.h * 0.0
        hout_ref[2] = out.det[0].astype(dtype) if cfg.stiff_detect else zf
        hout_ref[3] = out.det[1].astype(dtype) if cfg.stiff_detect else zf
        # Row 4: below-floor streak, fed back as h0_ref row 6.
        hout_ref[4] = out.fstreak[0].astype(dtype) if cfg.stiff_detect else zf
        # Rows 5..5+N: Kahan y compensation, fed back as h0_ref rows 7..7+N.
        if cfg.compensated:
            for i in range(n_eq):
                hout_ref[5 + i] = out.y_c[i]

    return kernel


def rk45_solve_pallas(
    model,
    y0: jax.Array,
    t0,
    tf,
    query_times: Optional[jax.Array] = None,
    params=None,
    forcings: Optional[ForcingSet] = None,
    h0: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    interpret: bool = False,
    t_shift=0.0,
) -> RK45Result:
    """Fused-kernel RK45 over ``y0[S, N]`` (float32 path).

    Drop-in for tiger_tpu.solver.rk45.rk45_solve (same result structure; the
    stiff subset still goes through the standard Radau pipeline).  ``params``
    must contain every field the model reads.  ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU tests).  ``t_shift`` (traced
    scalar, minutes) offsets the time seen by the MODEL's rhs — chunked runs
    integrate window-relative time but time-dependent physics (Model 200's
    doy) must see absolute time; forcing gathers stay window-relative.
    """
    y0 = jnp.asarray(y0, jnp.float32)
    s_count, n_eq = y0.shape
    if h0 is None and config.initial_step is not None:
        h0 = jnp.full((s_count,), config.initial_step, jnp.float32)
    if h0 is not None:
        # h0 is None stays None: the estimate is then traced INSIDE
        # _pallas_pipeline's jit — one device program instead of two
        # (the separately-jitted initial_step dispatch costs an extra
        # program launch + h0 materialization per solve, ~20-30 ms over a
        # remote-attached TPU).
        h0 = jnp.broadcast_to(jnp.asarray(h0, jnp.float32), (s_count,))

    # Models that need Mosaic-safe math variants opt in via fields the kernel
    # switches on (e.g. Model 200's polynomial inverse-trig for Hamon PET).
    if not interpret and getattr(model, "approx_trig", None) is False:
        import dataclasses as _dc

        model = _dc.replace(model, approx_trig=True)

    param_fields = tuple(sorted(params.keys())) if params is not None else ()
    meta = forcings.meta if forcings is not None else None
    forc_data = None if forcings is None else forcings.data
    qt, q_inverse = dedup_queries(query_times, jnp.float32)
    # The whole pipeline (pad/reshape + pallas_call + unpad) runs under ONE
    # jit: dispatched eagerly, the ~15 layout ops each pay a host->device
    # round trip, which dominated wall time on the remote-tunneled TPU.
    res = _pallas_pipeline(
        model, y0, h0, params, forc_data, qt,
        float(t0), float(tf), meta, config, param_fields, bool(interpret),
        jnp.asarray(t_shift, jnp.float32),
    )
    if q_inverse is not None:
        res = res._replace(dense=res.dense[:, q_inverse, :])
    return res


def dedup_queries(query_times, dtype):
    """(unique_qt, inverse|None): uniform duplicate-query contract.

    Every backend accepts sorted query times WITH duplicates (the vmap path
    fills each copy identically in the same accepted step).  The kernel's
    query-windowed mode cannot — a duplicate straddling a window boundary
    would never fill (tq > t0_w fails for the second copy) — so duplicates
    are collapsed before the pipeline and the dense rows re-expanded after:
    bit-identical to filling each copy, on every backend and every planner
    decision (previously the same input succeeded or raised depending on Q
    and the VMEM budget).  Unsorted input is an error everywhere: the
    monotone query cursor would silently produce wrong rows.
    """
    if query_times is None:
        return None, None
    qt_np = np.asarray(query_times)
    if (np.diff(qt_np) < 0).any():
        raise ValueError("query_times must be sorted ascending")
    uniq, inverse = np.unique(qt_np, return_inverse=True)
    if len(uniq) == len(qt_np):
        return jnp.asarray(qt_np, dtype), None
    return jnp.asarray(uniq, dtype), jnp.asarray(inverse)


@functools.partial(
    jax.jit,
    static_argnames=("model", "t0", "tf", "meta", "config", "param_fields", "interpret"),
)
def _pallas_pipeline(
    model, y0, h0, params, forc_data, query_times,
    t0, tf, meta, config, param_fields, interpret,
    t_shift=0.0,
):
    # Mosaic-safe math flip lives HERE (not only in the public wrapper):
    # dist.py calls this pipeline directly for sharded pallas runs, and a
    # Model 200 with exact trig would fail Mosaic lowering there.
    if not interpret and getattr(model, "approx_trig", None) is False:
        import dataclasses as _dc

        model = _dc.replace(model, approx_trig=True)
    s_count, n_eq = y0.shape
    if h0 is None:
        # Fused initial-step estimate: traced into THIS program so the
        # whole solve is one dispatch (see rk45_solve_pallas).
        from tiger_tpu.solver.controller import _initial_step_impl

        h0 = _initial_step_impl.__wrapped__(
            model, y0, t0, params, forc_data, meta, config,
            jnp.asarray(t_shift, jnp.float32),
        ).astype(jnp.float32)
    q_total = 0 if query_times is None else query_times.shape[0]
    t_forc = 1 if forc_data is None else forc_data.shape[0]
    n_par = max(len(param_fields), 1)

    f_bytes = 2 if config.forcing_dtype == "bf16" else 4
    # Biggest tile first, windowing the dense buffer (lax.scan over query
    # sub-intervals, carrying y and h) when that's what VMEM demands.
    # (Compensated mode's N_EQ extra y_c carries fit inside the ~74-value
    # per-lane slack the planner already budgets.)
    tile_rows, q_chunk = _plan_tiles(s_count, q_total, n_eq, t_forc, n_par, f_bytes)
    tile = tile_rows * LANES
    n_hrows = 7 + (n_eq if config.compensated else 0)
    n_orows = 5 + (n_eq if config.compensated else 0)

    # Pad S to a tile multiple; padded lanes replicate row 0.
    s_pad = ((s_count + tile - 1) // tile) * tile
    n_tiles = s_pad // tile

    def pad_tail(a, axis):
        pad_n = s_pad - s_count
        if pad_n == 0:
            return a
        idx = jnp.zeros((pad_n,), jnp.int32)
        return jnp.concatenate([a, jnp.take(a, idx, axis=axis)], axis=axis)

    r_total = s_pad // LANES
    y0_m = pad_tail(y0.T, 1).reshape(n_eq, r_total, LANES)
    h0_m = pad_tail(h0[None, :], 1).reshape(1, r_total, LANES)
    if params is not None:
        p_stack = jnp.stack([jnp.asarray(params[k], jnp.float32) for k in param_fields])
        p_m = pad_tail(p_stack, 1).reshape(len(param_fields), r_total, LANES)
    else:
        p_m = jnp.zeros((1, r_total, LANES), jnp.float32)
    f_dtype = jnp.bfloat16 if config.forcing_dtype == "bf16" else jnp.float32
    if forc_data is not None:
        f_m = pad_tail(forc_data, 1).reshape(-1, r_total, LANES).astype(f_dtype)
    else:
        f_m = jnp.zeros((1, r_total, LANES), f_dtype)

    qp = max(q_total, 1) if q_chunk is None else q_chunk
    kernel = _make_kernel(
        model, param_fields, meta, t0, tf, n_eq,
        q_total if q_chunk is None else q_chunk, config,
    )

    grid = (n_tiles,)
    row_map = lambda i: (0, i, 0)
    in_specs = [
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_eq, tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_hrows, tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((p_m.shape[0], tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((f_m.shape[0], tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((n_eq, tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (qp, n_eq, tile_rows, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((4, tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_orows, tile_rows, LANES), row_map, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_eq, r_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((qp, n_eq, r_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((1, r_total, LANES), jnp.int32),
        jax.ShapeDtypeStruct((4, r_total, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_orows, r_total, LANES), jnp.float32),
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((n_eq, tile_rows, LANES), jnp.float32)]
            if config.fsal
            else []
        ),
        interpret=interpret,
    )

    if q_chunk is None:
        qt_m = jnp.zeros((1, qp), jnp.float32)
        if q_total > 0:
            qt_m = query_times[None, :]
        bounds = jnp.stack(
            [jnp.full((), t0, jnp.float32), jnp.full((), tf, jnp.float32),
             jnp.asarray(t_shift, jnp.float32)]
        )[None, :]
        h_pair = jnp.concatenate(
            [h0_m, h0_m, jnp.zeros_like(h0_m), jnp.full_like(h0_m, 1e-4)]
            + [jnp.zeros_like(h0_m)] * (n_hrows - 4),
            axis=0,
        )
        yf, dense, stiff, stats, _ = call(
            bounds, qt_m, qt_m, y0_m, h_pair, p_m, f_m
        )
        failed_m = stats[3:4]
        stats_m = stats[:3]
    else:
        # ---- query-windowed multi-call: scan windows, carry (y, h) ----
        # Window i covers queries [i*Qc, (i+1)*Qc); its time interval is
        # (prev window's last query, own last query], except window 0 starts
        # at t0 and the last window ends at tf.  Forcing gathers use ABSOLUTE
        # time throughout, so only the dense buffer is windowed; the step
        # sequence matches the unwindowed kernel except that one step per
        # boundary is clamped to land exactly on it (tolerance-level effect,
        # same as the reference's clamp at tf, rk45_kernel.cu:54).
        n_w = -(-q_total // q_chunk)
        pad_q = n_w * q_chunk - q_total
        # Padding queries sit beyond tf: never filled, sliced off below.
        qt_flat = jnp.concatenate(
            [query_times, jnp.full((pad_q,), tf + 1.0 + abs(tf - t0), jnp.float32)]
        )
        idxs = jnp.arange(n_w)
        # Clamp to [t0, tf]: queries beyond tf must not extend a window's
        # integration span (the unwindowed kernel and the vmap path never
        # integrate past tf; such queries stay zero there too).
        starts = jnp.clip(
            jnp.where(idxs == 0, t0, qt_flat[jnp.maximum(idxs * q_chunk - 1, 0)]),
            t0, tf,
        )
        ends = jnp.clip(
            jnp.where(idxs == n_w - 1, tf, qt_flat[(idxs + 1) * q_chunk - 1]),
            t0, tf,
        )
        shifts = jnp.full((n_w,), jnp.asarray(t_shift, jnp.float32))
        bounds_seq = jnp.stack([starts, ends, shifts], axis=1).astype(
            jnp.float32
        )  # [n_w, 3]
        qt_chunks = qt_flat.reshape(n_w, 1, q_chunk)

        def wbody(carry, xs):
            (y_in, h_in, facold_in, det_in, wab_in, yc_in,
             stiff_acc, stats_acc, failed_acc) = carry
            qt_c, bnds = xs
            yf_w, dense_w, stiff_w, stats_w, h_out = call(
                bnds[None], qt_c, qt_c, y_in,
                jnp.concatenate(
                    [h0_m, h_in, stiff_acc.astype(jnp.float32), facold_in,
                     det_in, wab_in, yc_in],
                    axis=0,
                ),
                p_m, f_m,
            )
            carry = (
                yf_w,
                h_out[0:1],
                h_out[1:2],  # PI facold carried across windows (ADVICE r02)
                h_out[2:4],  # Hairer detector counters, likewise carried
                h_out[4:5],  # below-floor streak, likewise carried
                h_out[5:n_orows],  # Kahan y compensation, likewise carried
                jnp.maximum(stiff_acc, stiff_w),
                stats_acc + stats_w[:3],
                jnp.maximum(failed_acc, stats_w[3:4]),
            )
            return carry, dense_w

        init = (
            y0_m,
            h0_m,
            jnp.full((1, r_total, LANES), 1e-4, jnp.float32),
            jnp.zeros((2, r_total, LANES), jnp.float32),
            jnp.zeros((1, r_total, LANES), jnp.float32),
            jnp.zeros((n_orows - 5, r_total, LANES), jnp.float32),
            jnp.zeros((1, r_total, LANES), jnp.int32),
            jnp.zeros((3, r_total, LANES), jnp.int32),
            jnp.zeros((1, r_total, LANES), jnp.int32),
        )
        (yf, _, _, _, _, _, stiff, stats_m, failed_m), dense_seq = lax.scan(
            wbody, init, (qt_chunks, bounds_seq)
        )
        dense = dense_seq.reshape(n_w * q_chunk, n_eq, r_total, LANES)
        qp = n_w * q_chunk

    # Back to [S, ...] layout, dropping padding.
    yf = yf.reshape(n_eq, s_pad).T[:s_count]
    dense_out = dense.reshape(qp, n_eq, s_pad).transpose(2, 0, 1)[:s_count, :q_total]
    if q_total == 0:
        dense_out = dense_out[:, :0, :]
    stiff = stiff.reshape(s_pad)[:s_count] > 0
    failed = failed_m.reshape(s_pad)[:s_count] > 0
    stats_m = stats_m.reshape(3, s_pad)[:, :s_count]

    return RK45Result(
        y_final=yf,
        dense=dense_out,
        stiff=stiff,
        failed=failed,
        h0=h0,
        stats=RKStats(
            n_accepted=stats_m[0], n_rejected=stats_m[1], n_attempts=stats_m[2]
        ),
    )
