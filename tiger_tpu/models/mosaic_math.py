"""Inverse-trig built from Mosaic-available primitives (mul/add/sqrt/select).

Mosaic (Pallas TPU) has no lowering for atan/asin/acos (NotImplementedError:
"Unimplemented primitive ... atan"), which the Hamon PET daylight model needs.
These polynomial versions use only elementwise ops the VPU lowers natively.

Accuracy: the atan kernel is a degree-15 least-squares fit on [0, 1] evaluated
at import (max abs error ~3e-8, beyond float32 resolution); asin/acos come
from atan via identities.  tan is sin/cos (both native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fit_atan_coeffs(degree_terms: int = 8) -> np.ndarray:
    """Least-squares odd-polynomial fit of atan on [0, 1] (Chebyshev nodes)."""
    k = np.arange(1, 4001)
    z = 0.5 + 0.5 * np.cos((2 * k - 1) * np.pi / (2 * len(k)))  # nodes in (0,1)
    powers = np.stack([z ** (2 * i + 1) for i in range(degree_terms)], axis=1)
    coeffs, *_ = np.linalg.lstsq(powers, np.arctan(z), rcond=None)
    return coeffs


_ATAN_C = _fit_atan_coeffs()

# Import-time accuracy gate for the fit itself.
_z_check = np.linspace(0.0, 1.0, 1001)
_approx = sum(c * _z_check ** (2 * i + 1) for i, c in enumerate(_ATAN_C))
assert np.max(np.abs(_approx - np.arctan(_z_check))) < 1e-7

_HALF_PI = float(np.pi / 2.0)


def atan(x: jax.Array) -> jax.Array:
    """Elementwise arctangent via odd polynomial + reciprocal identity."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    z2 = z * z
    acc = jnp.zeros_like(z)
    for c in _ATAN_C[::-1]:
        acc = acc * z2 + float(c)
    val = acc * z
    val = jnp.where(inv, _HALF_PI - val, val)
    return jnp.where(x < 0.0, -val, val)


def asin(x: jax.Array) -> jax.Array:
    """arcsin via atan(x / sqrt(1 - x^2)); |x| clipped just inside [-1, 1]."""
    xc = jnp.clip(x, -1.0, 1.0)
    denom = jnp.sqrt(jnp.maximum(1.0 - xc * xc, 1e-12))
    return atan(xc / denom)


def acos(x: jax.Array) -> jax.Array:
    return _HALF_PI - asin(x)


def tan(x: jax.Array) -> jax.Array:
    return jnp.sin(x) / jnp.cos(x)
