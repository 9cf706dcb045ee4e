"""Daily soil-temperature update (Rankinen et al. 2002) with snow insulation.

jnp re-implementation of the reference host-only helper
(src/models/soiltemp.cpp:11-29; build-disabled, Makefile:77-79).  Kept for
future model variants, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Parameters from Rankinen et al. 2002 (soiltemp.cpp:18-24)
_CS = 1e6  # soil heat capacity [J/m^3/degC]
_KT = 0.516  # thermal conductivity [W/m/degC]
_CICE = 8.93e6  # ice heat capacity [J/m^3/degC]
_FS = -2.7  # snow insulation damping [1/m]
_ZS = 3.5e-2  # depth of layer midpoint (0-7 cm) [m]
_DT = 3600.0 * 24.0  # one day [s]


def soiltemp(t_air: jax.Array, t_z: jax.Array, d_snow: jax.Array) -> jax.Array:
    """One daily soil-temperature step.

    ``t_air``: air temperature [degC]; ``t_z``: previous soil temperature
    [degC]; ``d_snow``: snow depth [m].  Returns updated soil temperature.
    """
    ca = _CS + _CICE
    f = _DT * _KT / (ca * (2.0 * _ZS) * (2.0 * _ZS))
    t_star = t_z + f * (t_air - t_z)
    return t_star * jnp.exp(-_FS * d_snow)
