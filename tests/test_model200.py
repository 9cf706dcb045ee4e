"""Model 200 (Hamon-ET variant) and ET/soil-temp helper checks."""

import numpy as np
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from tiger_tpu.models import Model200, get_model
from tiger_tpu.models.et import et_actual, hamon_pet
from tiger_tpu.models.soiltemp import soiltemp
from tiger_tpu.solver import solve
from tests.test_model204 import NB_PARAMS, _params_row


def np_hamon(temperature, latitude, doy):
    """Independent numpy port of ETMethods::HamonPET (ETmethods.cpp:11-42)."""
    if temperature <= 0.0:
        return 0.0
    esat = 6.108 * np.exp((17.26939 * temperature) / (temperature + 237.3))
    wt = 216.7 * esat / (temperature + 273.3)
    theta = 0.2163108 + 2.0 * np.arctan(0.9671396 * np.tan(0.00860 * (doy - 186.0)))
    phi = np.arcsin(0.39795 * np.cos(theta))
    pi = np.pi
    num = np.sin(0.8333 * pi / 180.0) + np.sin(latitude * pi / 180.0) * np.sin(phi)
    den = np.cos(latitude * pi / 180.0) * np.cos(phi)
    with np.errstate(invalid="ignore"):
        d = (24.0 - (24.0 / pi) * np.arccos(num / den)) / 12.0
    if np.isnan(d):
        d = 2.0 if (phi > 0) == (latitude > 0) else 0.0
    return 1.6169e-6 * d * d * wt * 60.0 / 1000.0


def test_hamon_pet_matches_reference_port():
    rng = np.random.default_rng(0)
    for _ in range(60):
        temp = rng.uniform(-10, 35)
        lat = rng.uniform(-65, 65)
        doy = rng.uniform(1, 365)
        ours = float(hamon_pet(jnp.float64(temp), jnp.float64(lat), jnp.float64(doy)))
        np.testing.assert_allclose(ours, np_hamon(temp, lat, doy), rtol=1e-12, atol=1e-20)


def test_hamon_polar_handling():
    # Arctic summer: polar day -> D = 2; polar night -> D = 0 (PET 0 anyway
    # needs temp>0, so test with positive temp at high latitude).
    v_day = float(hamon_pet(jnp.float64(10.0), jnp.float64(80.0), jnp.float64(172.0)))
    v_night = float(hamon_pet(jnp.float64(10.0), jnp.float64(80.0), jnp.float64(355.0)))
    assert v_day > 0.0
    assert v_night == 0.0


def test_et_actual_ramp():
    assert float(et_actual(1.0, 0.1, 0.2, 0.8)) == 0.0  # below wilting
    np.testing.assert_allclose(float(et_actual(1.0, 0.5, 0.2, 0.8)), 0.5)  # mid-ramp
    assert float(et_actual(1.0, 0.9, 0.2, 0.8)) == 1.0  # above closure


def test_soiltemp_matches_reference_constants():
    # soiltemp.cpp:18-29 with no snow: Tz' = (Tz + f*(Ta - Tz)) * exp(2.7*Ds)
    cs, kt, cice, fs, zs, dt = 1e6, 0.516, 8.93e6, -2.7, 3.5e-2, 86400.0
    f = dt * kt / ((cs + cice) * (2 * zs) ** 2)
    expect = (5.0 + f * (15.0 - 5.0)) * np.exp(-fs * 0.1)
    np.testing.assert_allclose(float(soiltemp(15.0, 5.0, 0.1)), expect, rtol=1e-12)


def test_registry_has_200():
    assert isinstance(get_model(200), Model200)


def test_model200_integration_vs_scipy():
    from tiger_tpu.forcing import ForcingSet

    n_sys = 2
    pr = np.full((48, n_sys), 0.0008, np.float32)
    t2m = np.full((2, n_sys), 12.0, np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    params = {k: jnp.full((n_sys,), v) for k, v in NB_PARAMS.items()}
    y0 = jnp.tile(jnp.asarray([0.01, 0.3, 0.0, 5.0, 0.2]), (n_sys, 1))

    res = solve(Model200(), y0, 0.0, 2880.0, params=params, forcings=forc)
    assert not bool(np.asarray(res.failed).any())

    def np_rhs(t, y):
        P = NB_PARAMS
        h_snow, h_stat, h_surf, h_grav, h_aq = y
        rain, temp = 0.0008, 12.0
        doy = 1.0 + t / 1440.0
        melt = min(h_snow, temp * P["melt_f"]) if temp >= P["temp_thr"] else 0.0
        x1 = rain + melt
        x2 = max(0.0, x1 + h_stat - P["Hu"])
        pet = np_hamon(temp, P["lat"], doy)
        e_max = min(pet, h_stat)
        s = h_stat / P["Hu"]
        if s > P["ss"]:
            et = e_max
        elif s > P["sw"]:
            et = e_max * (s - P["sw"]) / (P["ss"] - P["sw"])
        else:
            et = 0.0
        x3 = min(x2, P["infil"])
        alfa2 = (1.0 / P["n_mann"]) * max(h_surf, 0.0) ** (2 / 3) * np.sqrt(P["slope"])
        w = min(1.0, alfa2 * P["L"] / P["A_h"] * 60.0)
        x4 = min(x3, P["perco"])
        return [
            rain - melt,
            (x1 - x2) - et,
            (x2 - x3) - h_surf * w,
            (x3 - x4) - h_grav / P["alpha3"],
            x4 - h_aq / P["alpha4"],
        ]

    sol = solve_ivp(np_rhs, (0, 2880), np.asarray(y0[0]), method="RK45", rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.y_final[0]), sol.y[:, -1], rtol=1e-4, atol=1e-9)
