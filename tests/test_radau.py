"""Radau IIA solver: step-level and pipeline-level checks vs SciPy."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tiger_tpu.solver import SolverConfig, radau_solve, solve


@dataclasses.dataclass(frozen=True)
class StiffDecay:
    """y0' = lam*(y0 - cos t) (stiff for |lam| large), y1' = -0.5*y1."""

    N_EQ: int = 2
    UID: int = 98

    def rhs(self, t, y, p, f=None):
        return jnp.stack([p["lam"] * (y[0] - jnp.cos(t)), -0.5 * y[1]])


def _scipy(lam, tf=50.0, dense=False):
    return solve_ivp(
        lambda t, y: [lam * (y[0] - np.cos(t)), -0.5 * y[1]],
        (0.0, tf),
        [2.0, 1.0],
        method="Radau",
        rtol=1e-6,
        atol=1e-9,
        dense_output=dense,
    )


def test_radau_standalone_nonstiff():
    params = {"lam": jnp.asarray([-0.5])}
    res = radau_solve(StiffDecay(), jnp.asarray([[2.0, 1.0]]), 0.0, 10.0, params=params)
    sol = solve_ivp(
        lambda t, y: [-0.5 * (y[0] - np.cos(t)), -0.5 * y[1]],
        (0, 10),
        [2.0, 1.0],
        method="Radau",
        rtol=1e-6,
        atol=1e-9,
    )
    assert not bool(res.failed.any())
    np.testing.assert_allclose(np.asarray(res.y_final[0]), sol.y[:, -1], rtol=1e-4, atol=1e-8)


@pytest.mark.slow
def test_stiff_pipeline_end_to_end():
    # Mixed batch: lanes 0/2 are stiff (lam=-1e6 over span 50 -> explicit step
    # limit ~3e-6 < span*1e-6 triggers the stiffness flag), lanes 1/3 are not.
    params = {"lam": jnp.asarray([-1e6, -0.2, -1e6, -0.3])}
    y0 = jnp.tile(jnp.asarray([2.0, 1.0]), (4, 1))
    qt = jnp.asarray([10.0, 25.0, 50.0])
    res = solve(StiffDecay(), y0, 0.0, 50.0, qt, params=params)

    np.testing.assert_array_equal(np.asarray(res.stiff), [True, False, True, False])
    assert res.n_stiff == 2
    assert not bool(np.asarray(res.failed).any())

    sol = _scipy(-1e6, dense=True)
    np.testing.assert_allclose(np.asarray(res.y_final[0]), sol.y[:, -1], rtol=1e-4, atol=1e-9)
    # Radau dense output (collocation interpolant) vs SciPy dense.
    np.testing.assert_allclose(np.asarray(res.dense[0, 1]), sol.sol(25.0), rtol=1e-4, atol=1e-8)
    # Stiff lanes 0 and 2 identical problems -> identical results.
    np.testing.assert_array_equal(np.asarray(res.y_final[0]), np.asarray(res.y_final[2]))

    # Non-stiff lane untouched by the Radau pass and correct.
    sol1 = solve_ivp(
        lambda t, y: [-0.2 * (y[0] - np.cos(t)), -0.5 * y[1]],
        (0, 50),
        [2.0, 1.0],
        method="RK45",
        rtol=1e-6,
        atol=1e-9,
    )
    np.testing.assert_allclose(np.asarray(res.y_final[1]), sol1.y[:, -1], rtol=1e-4, atol=1e-8)


def test_reference_error_mode_is_available():
    # The parity switch exists and produces much smaller steps (the reference's
    # inconsistent b_alt caps h near the tolerance; see tableau.RADAU_E3 note).
    params = {"lam": jnp.asarray([-2.0])}
    y0 = jnp.asarray([[2.0, 1.0]])
    fast = radau_solve(StiffDecay(), y0, 0.0, 1.0, params=params)
    slow = radau_solve(
        StiffDecay(), y0, 0.0, 1.0, params=params,
        config=SolverConfig(radau_error_mode="reference", max_steps=50000),
    )
    assert int(slow.stats.n_accepted[0]) > 4 * int(fast.stats.n_accepted[0])
