"""Segmented (query-to-query) solving vs interpolated dense output."""

import numpy as np
import jax.numpy as jnp

from tests.test_model204 import NB_PARAMS
from tiger_tpu.forcing import ForcingSet
from tiger_tpu.models import DummyModel, Model204, Y0_COMMON
from tiger_tpu.solver import SolverConfig, rk45_solve
from tiger_tpu.solver.segmented import segmented_solve


def test_dummy_segments_match_interpolated():
    y0 = jnp.ones((3, 5), jnp.float64)
    qt = np.linspace(0.5, 5.0, 10)
    h0 = jnp.full((3,), 0.03, jnp.float64)
    seg = segmented_solve(DummyModel(), "rk45", y0, 0.0, 5.0, qt, h0=h0)
    ref = rk45_solve(DummyModel(), y0, 0.0, 5.0, jnp.asarray(qt), h0=h0)
    assert not bool(np.asarray(seg.stiff).any())
    # Exact landing vs quartic interpolation: both integrate at rtol 1e-6.
    np.testing.assert_allclose(
        np.asarray(seg.dense), np.asarray(ref.dense), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(seg.y_final), np.asarray(ref.y_final), rtol=1e-6, atol=1e-9
    )


def test_model204_radau_segments():
    s = 2
    params = {k: jnp.full((s,), v) for k, v in NB_PARAMS.items()}
    pr = np.full((24, s), 0.001, np.float32)
    t2m = np.full((1, s), 5.0, np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray(Y0_COMMON), (s, 1))
    qt = np.arange(0.0, 721.0, 180.0)
    h0 = jnp.full((s,), 1e-3, jnp.float64)
    cfg = SolverConfig()
    seg = segmented_solve(
        Model204(), "radau", y0, 0.0, 720.0, qt, params, forc, h0=h0, config=cfg
    )
    assert not bool(np.asarray(seg.failed).any())
    # t=0 row prefilled; rows finite and state evolves.
    np.testing.assert_allclose(np.asarray(seg.dense[:, 0]), np.asarray(y0))
    assert np.isfinite(np.asarray(seg.dense)).all()
    assert not np.allclose(np.asarray(seg.dense[:, -1]), np.asarray(y0))


def test_queries_past_tf_clamped():
    y0 = jnp.ones((1, 5), jnp.float64)
    qt = np.asarray([2.0, 5.0, 7.5])  # last query beyond tf
    seg = segmented_solve(DummyModel(), "rk45", y0, 0.0, 5.0, qt, h0=jnp.full((1,), 0.03))
    # Row for t=7.5 holds the tf state (integration clamps at tf).
    np.testing.assert_allclose(
        np.asarray(seg.dense[0, 2]), np.asarray(seg.y_final[0]), rtol=1e-12
    )
