"""Step-level and integration-level checks of the RK45 core vs SciPy."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tiger_tpu.models import DummyModel
from tiger_tpu.solver import SolverConfig, rk45_solve
from tiger_tpu.solver.rk45 import dp_dense, dp_step


def _np_rhs(t, y):
    m = DummyModel()
    return np.asarray(m.rhs(t, jnp.asarray(y, jnp.float64), None, None))


def test_single_step_matches_scipy_rk_step():
    from scipy.integrate._ivp.rk import RK45, rk_step

    y0 = np.array([1.0, 1.0, 1.0, 1.0, 1.0])
    h = 0.05
    t = 0.3
    f0 = _np_rhs(t, y0)

    # SciPy's low-level stepper with the same DP tableau.
    solver = RK45(_np_rhs, t, y0, t_bound=10.0)
    y_sp, f_sp = rk_step(_np_rhs, t, y0, f0, h, solver.A, solver.B, solver.C, solver.K)

    model = DummyModel()
    rhs_t = lambda tt, yy: model.rhs(tt, yy, None, None)
    y_out, err, k, _, _ = dp_step(rhs_t, jnp.float64(t), jnp.asarray(y0), jnp.float64(h), jnp.asarray(f0), 1e-6, 1e-9)
    np.testing.assert_allclose(np.asarray(y_out), y_sp, rtol=1e-14, atol=1e-15)
    # Stage slopes must agree too.
    np.testing.assert_allclose(np.asarray(k)[:6], solver.K[:6], rtol=1e-13, atol=1e-14)


def test_dense_interpolant_matches_scipy_dense():
    # Integrate with SciPy, grab one step's stage slopes, and compare our
    # quartic interpolant to SciPy's dense output on that interval.
    sol = solve_ivp(
        _np_rhs, (0.0, 5.0), np.ones(5), method="RK45", rtol=1e-6, atol=1e-9, dense_output=True
    )
    seg = sol.sol.interpolants[3]
    t_lo, t_hi = seg.t_min, seg.t_max
    h = t_hi - t_lo
    # Recompute the stage slopes for that step from its left state.
    model = DummyModel()
    rhs_t = lambda tt, yy: model.rhs(tt, yy, None, None)
    y_lo = seg(t_lo)
    f0 = _np_rhs(t_lo, y_lo)
    _, _, k, _, _ = dp_step(rhs_t, jnp.float64(t_lo), jnp.asarray(y_lo), jnp.float64(h), jnp.asarray(f0), 1e-6, 1e-9)
    thetas = np.linspace(0.05, 1.0, 7)
    ours = np.asarray(dp_dense(jnp.asarray(y_lo), k, jnp.float64(h), jnp.asarray(thetas)))
    theirs = seg(t_lo + thetas * h).T
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_full_integration_matches_scipy():
    sol = solve_ivp(_np_rhs, (0.0, 5.0), np.ones(5), method="RK45", rtol=1e-6, atol=1e-9)
    y0 = jnp.ones((3, 5), jnp.float64)
    res = rk45_solve(DummyModel(), y0, 0.0, 5.0)
    assert not bool(res.stiff.any())
    # Both are rtol=1e-6 integrations; agreement to ~1e-6 relative expected.
    np.testing.assert_allclose(np.asarray(res.y_final[0]), sol.y[:, -1], rtol=5e-6, atol=1e-8)
    # All batch lanes identical.
    np.testing.assert_array_equal(np.asarray(res.y_final[0]), np.asarray(res.y_final[2]))


def test_dense_output_matches_scipy_dense():
    qt = np.linspace(0.25, 5.0, 40)
    sol = solve_ivp(
        _np_rhs, (0.0, 5.0), np.ones(5), method="RK45", rtol=1e-6, atol=1e-9, dense_output=True
    )
    res = rk45_solve(DummyModel(), jnp.ones((1, 5), jnp.float64), 0.0, 5.0, jnp.asarray(qt))
    np.testing.assert_allclose(np.asarray(res.dense[0]), sol.sol(qt).T, rtol=1e-5, atol=1e-7)


def test_fill_t0_queries_semantics():
    qt = jnp.asarray([0.0, 1.0, 5.0])
    y0 = jnp.ones((1, 5), jnp.float64)
    res = rk45_solve(DummyModel(), y0, 0.0, 5.0, qt, config=SolverConfig(fill_t0_queries=True))
    np.testing.assert_array_equal(np.asarray(res.dense[0, 0]), np.ones(5))
    res2 = rk45_solve(DummyModel(), y0, 0.0, 5.0, qt, config=SolverConfig(fill_t0_queries=False))
    # Reference parity: the t=0 row keeps its zero initialization
    # (rk45_kernel.cu:142 skips tq <= t).
    np.testing.assert_array_equal(np.asarray(res2.dense[0, 0]), np.zeros(5))
    # Query exactly at tf is filled in both modes.
    assert np.all(np.asarray(res2.dense[0, 2]) != 0.0)
    np.testing.assert_allclose(np.asarray(res2.dense[0, 2]), np.asarray(res2.y_final[0]), rtol=1e-12)


def test_per_system_h0_heterogeneous_batch():
    # Different initial conditions -> different step histories per lane;
    # each lane must match its own sequential integration.
    rng = np.random.default_rng(0)
    y0 = rng.uniform(0.5, 3.0, size=(6, 5))
    res = rk45_solve(DummyModel(), jnp.asarray(y0), 0.0, 5.0)
    for s in range(6):
        sol = solve_ivp(_np_rhs, (0.0, 5.0), y0[s], method="RK45", rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(res.y_final[s]), sol.y[:, -1], rtol=1e-5, atol=1e-7
        )
    # And batched == one-at-a-time: masked-lane stepping takes the *same step
    # sequence* (same accept/reject decisions), so agreement is at rounding
    # level (bit-exactness across batch shapes isn't guaranteed — XLA fuses
    # [6]-wide and [1]-wide elementwise chains differently).
    solo = rk45_solve(DummyModel(), jnp.asarray(y0[2:3]), 0.0, 5.0)
    np.testing.assert_allclose(
        np.asarray(res.y_final[2]), np.asarray(solo.y_final[0]), rtol=1e-12, atol=0
    )
    assert int(res.stats.n_attempts[2]) == int(solo.stats.n_attempts[0])


def test_stats_are_sane():
    res = rk45_solve(DummyModel(), jnp.ones((2, 5), jnp.float64), 0.0, 5.0)
    n_acc = np.asarray(res.stats.n_accepted)
    n_att = np.asarray(res.stats.n_attempts)
    assert np.all(n_acc >= 1)
    assert np.all(n_att >= n_acc)
