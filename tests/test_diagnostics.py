"""Diagnostics module: vectorized analogs of the reference debug kernels
(main.cpp:37-246)."""

import numpy as np
import jax.numpy as jnp

from tests.test_model204 import NB_PARAMS
from tiger_tpu.diagnostics import (
    describe_forcings,
    describe_params,
    eval_rhs,
    forcing_at,
    forcing_series,
    holding_summary,
)
from tiger_tpu.forcing import ForcingSet
from tiger_tpu.models import Model204


def _forc(s=4):
    pr = np.arange(24 * s, dtype=np.float32).reshape(24, s) * 0.01
    t2m = np.full((2, s), 5.0, np.float32)
    return ForcingSet.from_series([pr, t2m], [60.0, 1440.0])


def test_forcing_at_zoh_gather():
    f = _forc()
    # t=90 min -> hourly pr index 1, daily t2m index 0
    vals = forcing_at(f, 90.0)
    np.testing.assert_allclose(vals[0], np.arange(4, 8) * 0.01, rtol=1e-6)
    np.testing.assert_allclose(vals[1], 5.0)
    # past-the-end clamps to the last sample (ZOH semantics)
    vals_late = forcing_at(f, 1e9)
    np.testing.assert_allclose(vals_late[0], np.arange(92, 96) * 0.01, rtol=1e-6)


def test_forcing_series_and_describe():
    f = _forc()
    s0 = forcing_series(f, 0, system=2, n=3)
    np.testing.assert_allclose(s0, np.array([2, 6, 10]) * 0.01, rtol=1e-6)
    d = describe_forcings(f)
    assert d["num_systems"] == 4 and len(d["forcings"]) == 2
    assert d["forcings"][0]["n_steps"] == 24
    assert d["forcings"][1]["dt_min"] == 1440.0
    assert d["forcings"][0]["n_nan"] == 0


def test_describe_params_both_modes():
    s = 4
    params = {k: np.full((s,), v, np.float32) for k, v in NB_PARAMS.items()}
    one = describe_params(params, system=1)
    assert one["Hu"] == np.float32(NB_PARAMS["Hu"])
    rng = describe_params(params)
    assert rng["Hu"]["min"] == rng["Hu"]["max"]


def test_eval_rhs_matches_model():
    s = 4
    params = {k: jnp.full((s,), v, jnp.float32) for k, v in NB_PARAMS.items()}
    f = _forc(s)
    y = jnp.tile(jnp.asarray([0.01, 0.3, 0.0, 5.0, 0.2], jnp.float32), (s, 1))
    slopes = eval_rhs(Model204(), y, 90.0, params, f)
    assert slopes.shape == (s, 5)
    assert np.isfinite(np.asarray(slopes)).all()
    # Cross-check one lane against a direct rhs_tuple call.
    fv = forcing_at(f, 90.0)
    direct = Model204().rhs_tuple(
        jnp.full((s,), 90.0, jnp.float32),
        tuple(y[:, i] for i in range(5)),
        params,
        tuple(jnp.asarray(r) for r in fv),
    )
    np.testing.assert_allclose(np.asarray(slopes), np.stack(direct, 1), rtol=1e-6)


def test_holding_summary_flags():
    y = np.array([[1.0, -2.0], [np.nan, 3.0]])
    h = holding_summary(y, ["a", "b"])
    assert h["a"]["n_nan"] == 1 and h["b"]["n_negative"] == 1
