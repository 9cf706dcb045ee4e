"""Stiff-rung economics regression guard (round-3 incident).

Round 3 shipped ``radau_predictor=True`` as the default, which blew the
attempt counts of genuinely stiff lanes up ~30x (15k-82k attempts/lane vs
~2k from the f0 tile start) and cut the two-phase headline benchmark ~14x
(BENCH_r03: vs_baseline 0.07).  The correctness suite stayed green because
the RESULTS were still right — only the WORK exploded.  These tests pin the
economics, not the numerics: the bench's own stiff scenario must finish
within an attempts/sweeps budget on the default config, so a solver change
that silently multiplies the step or Newton work fails CI instead of
shipping.

Reference anchor: the Radau rung replaces radau_kernel.cu:20-140, whose
f(t, y) Newton start (radau_step_dense.cuh:80-87) is the baseline these
budgets encode.
"""

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _scenario
from tiger_tpu.models import Model204
from tiger_tpu.solver import SolverConfig
from tiger_tpu.solver.radau import radau_solve

# Budgets calibrated against the healthy (predictor-off) operating point of
# the 2-day fully-stiff scenario: 1.9k-2.6k attempts/lane at ~3.2 Newton
# sweeps/attempt (round-3 verdict experiment, reproduced here).  The round-3
# regression measured 15k-82k attempts/lane at ~9.9 sweeps — far outside.
ATTEMPTS_BUDGET = 5_000
SWEEPS_PER_ATTEMPT_BUDGET = 6.0


def _stiff_scenario(s_count=8, days=2.0):
    y0, params, forcings = _scenario(
        s_count, jnp.float32, days=days, stiff_frac=1.0
    )
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=100_000)
    return y0, params, forcings, cfg, days * 1440.0


def test_stiff_lane_attempts_budget():
    y0, params, forcings, cfg, tf = _stiff_scenario()
    res = radau_solve(
        Model204(), y0, 0.0, tf, None, params, forcings, config=cfg
    )
    assert not bool(res.failed.any())
    att = np.asarray(res.stats.n_attempts)
    assert att.max() <= ATTEMPTS_BUDGET, (
        f"stiff-lane attempts blew the budget: max {att.max()}/lane "
        f"(budget {ATTEMPTS_BUDGET}); round-3-style work regression"
    )
    sweeps = np.asarray(res.stats.n_newton).sum() / max(att.sum(), 1)
    assert sweeps <= SWEEPS_PER_ATTEMPT_BUDGET, (
        f"Newton sweeps/attempt {sweeps:.2f} exceed budget "
        f"{SWEEPS_PER_ATTEMPT_BUDGET}: bad Newton starts or broken reuse"
    )


