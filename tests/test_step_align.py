"""ZOH forcing-boundary step alignment (SolverConfig.forcing_step_align).

Forcing is frozen at step-start for every stage (reference parity,
rk45_kernel.cu:84-116), so a step that CROSSES a sample boundary integrates
the old value through the new interval — an O(h * delta_F) local error the
embedded error estimate cannot see.  With alignment every step lands ON the
next boundary, the frozen value is exact over the step, and the scheme
converges to the true ZOH solution; without it the committed error is
thousands of tolerance units (measured 0.35 absolute in h_snow on the 2-day
stiff scenario — in float64, i.e. scheme error, not rounding).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _scenario
from tiger_tpu.models import Model204
from tiger_tpu.solver import SolverConfig, rk45_solve
from tiger_tpu.solver.radau import radau_solve


def _setup(days=0.5, s=4):
    y0, params, forcings = _scenario(s, jnp.float32, days=days, stiff_frac=1.0)
    y064 = jnp.asarray(np.asarray(y0), jnp.float64)
    p64 = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params.items()}
    return y064, p64, forcings, days * 1440.0


def test_aligned_radau_converges_to_zoh_truth():
    y0, params, forcings, tf = _setup()
    tight = SolverConfig(rtol=1e-8, atol=1e-11, max_steps=400_000)
    prod = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=200_000)
    r_t = radau_solve(Model204(), y0, 0.0, tf, None, params, forcings, config=tight)
    r_p = radau_solve(Model204(), y0, 0.0, tf, None, params, forcings, config=prod)
    assert not bool(r_t.failed.any()) and not bool(r_p.failed.any())
    tolu = np.abs(np.asarray(r_p.y_final) - np.asarray(r_t.y_final)) / (
        1e-8 + 1e-5 * np.abs(np.asarray(r_t.y_final))
    )
    # In f64 the aligned scheme is exact ZOH integration: the two tolerance
    # settings agree to rounding (measured 0.0 tol units; 1.0 is generous).
    assert tolu.max() < 1.0, f"aligned f64 error {tolu.max()} tol units"

    # Counterfactual: the unaligned scheme commits errors the estimate never
    # sees — orders above tolerance at the SAME settings.
    r_u = radau_solve(
        Model204(), y0, 0.0, tf, None, params, forcings,
        config=dataclasses.replace(prod, forcing_step_align=False),
    )
    tolu_u = np.abs(np.asarray(r_u.y_final) - np.asarray(r_t.y_final)) / (
        1e-8 + 1e-5 * np.abs(np.asarray(r_t.y_final))
    )
    assert tolu_u.max() > 50 * tolu.max() + 10, (
        f"expected unaligned >> aligned, got {tolu_u.max()} vs {tolu.max()}"
    )


def test_aligned_rk45_steps_land_on_boundaries():
    y0, params, forcings, tf = _setup(days=0.25, s=2)
    # Non-stiff parameters so RK45 finishes without flagging.
    y0n, params_n, forcings_n = _scenario(2, jnp.float32, days=0.25, stiff_frac=0.0)
    y0n = jnp.asarray(np.asarray(y0n), jnp.float64)
    params_n = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params_n.items()}
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=50_000)
    r_a = rk45_solve(Model204(), y0n, 0.0, 360.0, None, params_n, forcings_n, config=cfg)
    r_t = rk45_solve(
        Model204(), y0n, 0.0, 360.0, None, params_n, forcings_n,
        config=dataclasses.replace(cfg, rtol=1e-9, atol=1e-12),
    )
    assert not bool(r_a.stiff.any())
    tolu = np.abs(np.asarray(r_a.y_final) - np.asarray(r_t.y_final)) / (
        1e-8 + 1e-5 * np.abs(np.asarray(r_t.y_final))
    )
    assert tolu.max() < 1.0, f"aligned RK45 f64 error {tolu.max()} tol units"
