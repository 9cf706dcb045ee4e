"""Model 204 physics: RHS unit checks + forced end-to-end integration vs SciPy.

The RHS oracle is an independent numpy re-implementation of the notebook's
model204_rhs stub (src/model_dummy_python.ipynb cell 12) with its stub
parameter values, evaluated at random states.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tiger_tpu.models import Model204, Y0_COMMON
from tiger_tpu.solver import SolverConfig, solve

# Notebook cell-12 stub parameters.
NB_PARAMS = dict(
    c1=0.001 / 60.0,
    infil=0.0001 * (0.001 / 60.0),
    perco=0.00005 * (0.001 / 60.0),
    Hu=0.5,
    lat=45.0,
    sw=0.2,
    ss=0.8,
    n_mann=0.03,
    slope=0.05,
    L=1000.0,
    A_h=1e5,
    alpha3=2 * 24 * 60.0,
    alpha4=5 * 24 * 60.0,
    melt_f=0.00001,
    temp_thr=0.0,
)


def np_rhs_204(t, y, P, rainfall, temperature):
    """Independent numpy oracle for the Model-204 RHS."""
    h_snow, h_stat, h_surf, h_grav, h_aq = y
    snowmelt = min(h_snow, temperature * P["melt_f"]) if temperature >= P["temp_thr"] else 0.0
    x1 = rainfall + snowmelt
    d0 = rainfall - snowmelt
    x2 = max(0.0, x1 + h_stat - P["Hu"])
    d1v = x1 - x2
    e_max = min(0.1 * temperature, h_stat)
    s = h_stat / P["Hu"]
    d1 = d1v - s * e_max
    x3 = min(x2, P["infil"])
    d2v = x2 - x3
    alfa2 = (1.0 / P["n_mann"]) * h_surf ** (2.0 / 3.0) * np.sqrt(P["slope"])
    w = min(1.0, alfa2 * P["L"] / P["A_h"] * 60.0)
    d2 = d2v - h_surf * w
    x4 = min(x3, P["perco"])
    d3v = x3 - x4
    d3 = d3v - (h_grav / P["alpha3"] if P["alpha3"] >= 1.0 else 0.0)
    d4 = x4 - (h_aq / P["alpha4"] if P["alpha4"] >= 1.0 else 0.0)
    return np.array([d0, d1, d2, d3, d4])


def _params_row(P):
    return {k: jnp.float64(v) for k, v in P.items()}


def test_rhs_matches_numpy_oracle():
    model = Model204()
    rng = np.random.default_rng(42)
    for _ in range(50):
        y = rng.uniform(0.0, 3.0, 5)
        t = rng.uniform(0.0, 2880.0)
        pr, temp = rng.uniform(0, 0.002), rng.uniform(-5, 20)
        ours = np.asarray(
            model.rhs(
                jnp.float64(t),
                jnp.asarray(y),
                _params_row(NB_PARAMS),
                jnp.asarray([pr, temp], jnp.float32),
            )
        )
        # Forcings pass through float32 like the reference's device arrays.
        oracle = np_rhs_204(t, y, NB_PARAMS, np.float64(np.float32(pr)), np.float64(np.float32(temp)))
        np.testing.assert_allclose(ours, oracle, rtol=1e-12, atol=1e-15)


def test_rhs_no_forcings_is_zero_input():
    model = Model204()
    y = np.array([0.5, 0.3, 0.1, 2.0, 0.2])
    ours = np.asarray(model.rhs(jnp.float64(0.0), jnp.asarray(y), _params_row(NB_PARAMS), None))
    oracle = np_rhs_204(0.0, y, NB_PARAMS, 0.0, 0.0)
    np.testing.assert_allclose(ours, oracle, rtol=1e-12)


def test_notebook_stub_integration_vs_scipy():
    # The notebook's exact scenario: constant rainfall 0.001 m/min, T=1 degC,
    # y0 = common cold-start state, 2 days in minutes.
    from tiger_tpu.forcing import ForcingSet

    n_sys = 3
    pr = np.full((48, n_sys), 0.001, np.float32)  # hourly, 2 days
    t2m = np.full((2, n_sys), 1.0, np.float32)  # daily, 2 days
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    params = {k: jnp.full((n_sys,), v) for k, v in NB_PARAMS.items()}
    y0 = jnp.tile(jnp.asarray(Y0_COMMON), (n_sys, 1))
    qt = jnp.arange(0.0, 2881.0, 60.0)

    res = solve(Model204(), y0, 0.0, 2880.0, qt, params=params, forcings=forc)
    assert res.n_stiff == 0

    sol = solve_ivp(
        lambda t, y: np_rhs_204(t, y, NB_PARAMS, 0.001, 1.0),
        (0.0, 2880.0),
        np.asarray(Y0_COMMON),
        method="RK45",
        rtol=1e-6,
        atol=1e-9,
        dense_output=True,
    )
    np.testing.assert_allclose(np.asarray(res.y_final[0]), sol.y[:, -1], rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.dense[0][1:]), sol.sol(np.asarray(qt[1:])).T, rtol=1e-4, atol=1e-8
    )
    # t=0 query prefilled with y0 by default.
    np.testing.assert_array_equal(np.asarray(res.dense[0, 0]), np.asarray(y0[0]))


def test_time_varying_forcing_zoh_semantics():
    # Hourly-varying rainfall: our solver freezes forcing at step-start t
    # (reference parity); SciPy sees the same piecewise-constant function of
    # its own eval time.  Near-boundary sampling differs, so tolerance is
    # looser, but the two must agree to controller accuracy.
    from tiger_tpu.forcing import ForcingSet

    rng = np.random.default_rng(7)
    hours = 48
    pr_series = rng.uniform(0.0, 0.002, hours).astype(np.float32)
    t2m_series = np.asarray([5.0, 12.0], np.float32)
    pr = np.tile(pr_series[:, None], (1, 2))
    t2m = np.tile(t2m_series[:, None], (1, 2))
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    params = {k: jnp.full((2,), v) for k, v in NB_PARAMS.items()}
    y0 = jnp.tile(jnp.asarray(Y0_COMMON), (2, 1))

    res = solve(Model204(), y0, 0.0, 2880.0, params=params, forcings=forc)

    def scipy_rhs(t, y):
        ip = min(int(t // 60.0), hours - 1)
        it = min(int(t // 1440.0), 1)
        return np_rhs_204(t, y, NB_PARAMS, float(pr_series[ip]), float(t2m_series[it]))

    sol = solve_ivp(
        scipy_rhs, (0.0, 2880.0), np.asarray(Y0_COMMON), method="RK45", rtol=1e-6, atol=1e-9,
        max_step=30.0,  # keep SciPy from stepping across many forcing jumps
    )
    # Frozen-at-step-start forcing (reference semantics) vs SciPy's
    # stage-time sampling introduces an O(h)-at-boundaries holding error;
    # ~0.5% on the rain-accumulating snow store is expected.
    np.testing.assert_allclose(np.asarray(res.y_final[0]), sol.y[:, -1], rtol=1e-2, atol=1e-6)
    # Identical lanes agree exactly.
    np.testing.assert_array_equal(np.asarray(res.y_final[0]), np.asarray(res.y_final[1]))


def test_derived_params_rhs_equivalence():
    # The hoisted loop-invariant forms (reciprocals, Manning coefficient)
    # must agree with the raw per-eval math to rounding.
    import numpy as np

    rng = np.random.default_rng(3)
    n = 16
    params = {
        "c1": jnp.full(n, 0.001 / 60),
        "infil": jnp.asarray(rng.uniform(1e-6, 1e-4, n)),
        "perco": jnp.asarray(rng.uniform(1e-7, 5e-5, n)),
        "Hu": jnp.asarray(rng.uniform(0.1, 200.0, n)),
        "lat": jnp.asarray(rng.uniform(-60, 60, n)),
        "sw": jnp.full(n, 0.2), "ss": jnp.full(n, 0.8),
        "n_mann": jnp.asarray(rng.uniform(0.01, 0.1, n)),
        "slope": jnp.asarray(rng.uniform(0.001, 0.2, n)),
        "L": jnp.asarray(rng.uniform(0.1, 5.0, n)),
        "A_h": jnp.asarray(rng.uniform(1.0, 100.0, n)),
        # include alpha < 1 rows (drain term must be exactly zero)
        "alpha3": jnp.asarray(np.where(rng.uniform(size=n) < 0.3, 0.5, 2880.0)),
        "alpha4": jnp.asarray(np.where(rng.uniform(size=n) < 0.3, 0.0, 79200.0)),
        "melt_f": jnp.full(n, 1e-4), "temp_thr": jnp.zeros(n),
    }
    y = tuple(jnp.asarray(rng.uniform(0, 2, n)) for _ in range(5))
    forc = (jnp.full(n, 1e-3), jnp.full(n, 6.0))
    for model_cls in (Model204,):
        m = model_cls()
        raw = m.rhs_tuple(100.0, y, params, forc)
        drv = m.rhs_tuple(100.0, y, m.derived_params(params), forc)
        for a, b in zip(raw, drv):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-18)

    from tiger_tpu.models import Model200

    m2 = Model200()
    raw = m2.rhs_tuple(100.0, y, params, forc)
    drv = m2.rhs_tuple(100.0, y, m2.derived_params(params), forc)
    for a, b in zip(raw, drv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-18)
