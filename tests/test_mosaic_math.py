"""Polynomial inverse-trig (Mosaic-safe) vs numpy, and Hamon equivalence."""

import numpy as np
import jax.numpy as jnp

from tiger_tpu.models import mosaic_math as mm
from tiger_tpu.models.et import hamon_pet


def test_atan_accuracy():
    x = np.concatenate([np.linspace(-50, 50, 4001), np.linspace(-1.5, 1.5, 2001)])
    ours = np.asarray(mm.atan(jnp.asarray(x)))
    np.testing.assert_allclose(ours, np.arctan(x), atol=2e-7, rtol=0)


def test_asin_acos_accuracy():
    x = np.linspace(-0.999, 0.999, 4001)
    np.testing.assert_allclose(np.asarray(mm.asin(jnp.asarray(x))), np.arcsin(x), atol=5e-6)
    np.testing.assert_allclose(np.asarray(mm.acos(jnp.asarray(x))), np.arccos(x), atol=5e-6)


def test_tan_accuracy():
    x = np.linspace(-1.4, 1.4, 1001)
    np.testing.assert_allclose(np.asarray(mm.tan(jnp.asarray(x))), np.tan(x), rtol=1e-9, atol=1e-12)


def test_hamon_approx_matches_exact():
    rng = np.random.default_rng(0)
    temp = jnp.asarray(rng.uniform(1, 30, 500))
    lat = jnp.asarray(rng.uniform(-60, 60, 500))
    doy = jnp.asarray(rng.uniform(1, 365, 500))
    exact = np.asarray(hamon_pet(temp, lat, doy))
    approx = np.asarray(hamon_pet(temp, lat, doy, approx_trig=True))
    np.testing.assert_allclose(approx, exact, rtol=1e-5, atol=1e-12)
