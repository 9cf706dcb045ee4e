"""Benchmark: hillslope-systems x RK-steps per second on one chip.

Runs the flagship Model-204 scenario (synthetic ERA5-shaped forcings, 2-day
integration, hourly dense queries — the reference's artifact configuration,
main.cpp:610-657) over a large batch and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the ratio
to the previous recorded run of THIS benchmark (bench_baseline.json, updated
by --record) — i.e., progress across rounds; 1.0 when no record exists.

Runs on whatever backend the environment selects (the driver provides the real
TPU).  float32 with rtol 1e-5 / atol 1e-8: the TPU performance path (f64 is
software-emulated on TPU; f64 parity is covered by the CPU test suite).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def read_baseline(path: str, solver: str, expect: dict | None = None):
    """Recorded steps/s for ``solver`` ('rk45' | 'radau'), or None.

    The file holds one entry per solver so regressions in the implicit kernel
    are tracked like the explicit one; a legacy flat record (round 1) is read
    as the rk45 entry.  ``expect`` (systems/backend) guards against comparing
    a differently-configured run to the record — mismatches return None
    rather than printing a meaningless vs_baseline.
    """
    if not os.path.exists(path):
        return None
    with open(path) as f:
        doc = json.load(f)
    if "value" in doc:  # legacy flat format
        doc = {"rk45": doc}
    entry = doc.get(solver)
    if not entry:
        return None
    for k, v in (expect or {}).items():
        if k in entry and entry[k] != v:
            return None
    return entry.get("value")


def write_baseline(path: str, solver: str, record: dict) -> None:
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
        if "value" in doc:  # migrate legacy flat format
            doc = {"rk45": doc}
    doc[solver] = record
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--systems", type=int, default=131_072)
    p.add_argument("--days", type=float, default=2.0)
    p.add_argument("--record", action="store_true", help="update bench_baseline.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--backend",
        default="pallas",
        choices=["pallas", "xla"],
        help="pallas = fused kernel (default); xla = vmap reference path",
    )
    p.add_argument(
        "--solver",
        default="rk45",
        choices=["rk45", "radau"],
        help="radau benches the fused implicit kernel instead",
    )
    p.add_argument(
        "--fsal", action="store_true",
        help="rk45 kernel FSAL carry (6 rhs evals/attempt instead of 7; "
        "bit-identical, but MEASURED SLOWER on v5e at 64-row tiles — the "
        "carry bookkeeping and boundary refresh cost more than the saved "
        "RHS eval on Model 204's cheap RHS: 525 -> 488M steps/s)",
    )
    p.add_argument(
        "--forcing-bf16", dest="forcing_bf16", action="store_true",
        help="store kernel-resident forcing in bf16 (halves its VMEM; "
        "measured slower at the default tile height — 525 -> 466M — and "
        "128-row tiles exceed scoped VMEM, so f32 stays the default)",
    )
    p.add_argument(
        "--model", type=int, default=204, choices=[204, 200],
        help="model family: 204 (headline) or 200 (Hamon-PET/ET variant; "
        "exercises the Mosaic-safe polynomial inverse-trig in-kernel)",
    )
    p.add_argument(
        "--stiff-frac", type=float, default=0.001,
        help="fraction of systems made genuinely stiff (near-zero Hu) so the "
        "headline includes the two-phase RK45->Radau orchestration cost.  "
        "Model 204 only: the tiny-Hu lane is stiff through 204's UNCAPPED "
        "linear ET stub (eig ~ -0.1*T/Hu); Model 200's fluxes are all "
        "rate-capped by design (bounded ETactual ramp, min-capped "
        "Manning/melt/alpha drains), so no parameter choice yields a "
        "smooth stiff M200 lane at f32 tolerances (DESIGN.md round-5) — "
        "its two-phase run reports n_stiff=0 and its implicit-kernel "
        "record comes from --solver radau --model 200 instead",
    )
    p.add_argument(
        "--dense-lockstep", dest="dense_lockstep", action="store_true",
        help="SolverConfig.dense_lockstep: barrier lanes at each query time "
        "so the kernel's dense fill never spans more than ~1 query (a win "
        "only when queries are coarser than typical steps; see DESIGN.md "
        "round-5 dense-fill decomposition)",
    )
    p.add_argument(
        "--rk-only", action="store_true",
        help="bench the bare RK45 kernel (no stiff second phase) — kernel "
        "micro-benchmark mode, the round-1/2 configuration",
    )
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tiger_tpu.profiling import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _scenario
    from tiger_tpu.models import Model200, Model204
    from tiger_tpu.solver.api import solve
    from tiger_tpu.solver.config import SolverConfig
    from tiger_tpu.solver.rk45 import rk45_solve
    from tiger_tpu.kernels.radau_pallas import radau_solve_pallas
    from tiger_tpu.kernels.rk45_pallas import rk45_solve_pallas

    import functools

    two_phase = args.solver == "rk45" and not args.rk_only
    if args.solver == "radau":
        # --cpu runs the kernel in the Pallas interpreter (slow; smoke only).
        solver_fn = functools.partial(radau_solve_pallas, interpret=args.cpu)
    elif two_phase:
        # Headline mode: the FULL production pipeline — fused RK45 kernel,
        # host stiff compaction, on-device Radau rung, result merge — so the
        # number prices the two-phase orchestration, not just the hot kernel.
        solver_fn = functools.partial(
            solve, backend=args.backend if not args.cpu else "auto"
        )
    else:
        solver_fn = rk45_solve_pallas if args.backend == "pallas" and not args.cpu else rk45_solve

    dtype = jnp.float32
    s_count = args.systems
    tf = args.days * 1440.0
    model = Model204() if args.model == 204 else Model200()
    config = SolverConfig(
        rtol=1e-5, atol=1e-8, max_steps=100_000, fsal=args.fsal,
        forcing_dtype="bf16" if args.forcing_bf16 else "f32",
        dense_lockstep=args.dense_lockstep,
    )
    y0, params, forcings = _scenario(
        s_count, dtype, days=args.days,
        stiff_frac=args.stiff_frac if two_phase else 0.0,
    )
    qt = jnp.arange(0.0, tf + 1e-9, 60.0, dtype=dtype)
    h0 = jnp.full((s_count,), 1e-3, dtype)

    def solve_once(eps: float):
        # Perturb the input per call: defeats any end-to-end result caching in
        # the execution pipeline, so each timed call is real device work.
        kw = {} if two_phase else {"h0": h0}
        res = solver_fn(
            model, y0 + eps, 0.0, tf, qt, params, forcings, config=config, **kw
        )
        # Materialize a value derived from the full output.
        checksum = float(jnp.nansum(res.y_final))
        return res, checksum

    # Warmup/compile, with one retry: a previous process dying mid-claim can
    # leave the (tunneled) TPU wedged for one execution.
    import sys

    try:
        res, _ = solve_once(0.0)
    except Exception as exc:  # noqa: BLE001 — transient device errors
        print(f"warmup failed ({exc}); retrying once", file=sys.stderr)
        time.sleep(30)
        res, _ = solve_once(0.0)
    walls, sums = [], []
    for i in range(1, 4):
        t0 = time.perf_counter()
        res, s = solve_once(i * 1e-7)
        walls.append(time.perf_counter() - t0)
        sums.append(s)
    wall = float(np.median(walls))
    # Run-to-run spread in the headline JSON: the remote-TPU tunnel jitters
    # 10-30% (year_run_tpu.json recorded 107.8/145.6/110.6 s walls), and
    # without the spread a tunnel artifact is indistinguishable from a real
    # regression at readout time.
    wall_spread = {
        "wall_s_min": float(np.min(walls)),
        "wall_s_max": float(np.max(walls)),
    }
    if len(set(sums)) == 1:
        print("warning: identical checksums across perturbed runs", file=sys.stderr)

    stats = res.rk_stats if two_phase else res.stats
    n_attempts = int(np.asarray(stats.n_attempts).sum())
    extra = {}
    if two_phase and res.radau_stats is not None:
        # Two-phase headline counts the Radau re-integration attempts too:
        # those lanes' RK attempts were spent flagging, the Radau steps are
        # the work that actually finished them.
        n_radau = int(np.asarray(res.radau_stats.n_attempts).sum())
        extra["radau_attempts"] = n_radau
        n_attempts += n_radau
    value = n_attempts / wall
    if hasattr(res, "stiff"):
        extra["n_stiff"] = int(np.asarray(res.stiff).sum())
    # RadauResult has no stiff flag — report failures under their own name.
    extra["n_failed"] = int(np.asarray(res.failed).sum())
    if getattr(stats, "n_newton", None) is not None:
        n_sweeps = int(np.asarray(stats.n_newton).sum())
        n_acc = int(np.asarray(stats.n_accepted).sum())
        extra["newton_sweeps_per_attempt"] = round(n_sweeps / max(n_attempts, 1), 3)
        extra["accept_ratio"] = round(n_acc / max(n_attempts, 1), 4)

    baseline_path = os.path.join(os.path.dirname(__file__) or ".", "bench_baseline.json")
    # Two-phase runs are a different metric (full pipeline incl. the Radau
    # rung) than the bare-kernel micro-benchmark — separate baseline entries
    # so neither masquerades as a regression of the other.
    baseline_key = "two-phase" if two_phase else args.solver
    if args.model != 204:
        baseline_key = f"{baseline_key}-m{args.model}"
    if s_count != 131_072:
        # Non-default batch sizes get their own entry: --record at e.g. 2M
        # must not clobber the canonical 131k record the rounds compare on.
        baseline_key = f"{baseline_key}-s{s_count}"
    baseline = read_baseline(
        baseline_path, baseline_key,
        expect={"systems": s_count, "backend": jax.devices()[0].platform},
    )
    vs = (value / baseline) if baseline else 1.0
    if vs < 0.8:
        # Loud regression flag (round-3 lesson: a 14x headline regression
        # shipped with vs_baseline 0.07 in its own BENCH file, uncaught).
        print(
            f"REGRESSION WARNING: {baseline_key} at {vs:.3f}x the committed "
            f"record ({value:.3g} vs {baseline:.3g} system-steps/s) — do not "
            "ship without isolating the cause",
            file=sys.stderr,
        )

    if args.record:
        write_baseline(
            baseline_path,
            baseline_key,
            {
                "value": value,
                "unit": "system-steps/s",
                "systems": s_count,
                "wall_s": wall,
                "backend": jax.devices()[0].platform,
            },
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"model{args.model}_e2e_system_steps_per_s"
                    if two_phase
                    else (
                        f"model{args.model}_{args.solver}_system_steps_per_s"
                        if args.solver != "rk45"
                        else f"model{args.model}_system_steps_per_s"
                    )
                ),
                "value": value,
                "unit": "system-steps/s",
                "vs_baseline": vs,
                "systems": s_count,
                "steps_total": n_attempts,
                "wall_s": wall,
                **wall_spread,
                "backend": jax.devices()[0].platform,
                # fsal is implemented only in the fused RK45 kernel (which
                # the two-phase pipeline dispatches to on TPU f32 batches).
                "fsal": bool(
                    args.fsal
                    and (two_phase or solver_fn is rk45_solve_pallas)
                    and not args.cpu
                ),
                "solver": (
                    "radau-pallas"
                    if args.solver == "radau"
                    else (
                        f"two-phase-{args.backend}"
                        if two_phase
                        else (
                            "pallas"
                            if solver_fn is rk45_solve_pallas
                            else "xla-vmap"
                        )
                    )
                ),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
