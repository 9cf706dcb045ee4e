"""solve() input validation and a seeded kernel-vs-vmap fuzz sweep."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_model204 import NB_PARAMS
from tiger_tpu.forcing import ForcingSet
from tiger_tpu.kernels.rk45_pallas import rk45_solve_pallas
from tiger_tpu.models import DummyModel, Model204
from tiger_tpu.solver import SolverConfig, rk45_solve, solve


def test_bad_y0_rank():
    with pytest.raises(ValueError, match="num_systems"):
        solve(DummyModel(), jnp.ones(5), 0.0, 1.0)


def test_wrong_state_count():
    with pytest.raises(ValueError, match="expects"):
        solve(DummyModel(), jnp.ones((2, 3)), 0.0, 1.0)


def test_param_row_mismatch():
    params = {k: jnp.full((3,), v) for k, v in NB_PARAMS.items()}
    with pytest.raises(ValueError, match="one row per system"):
        solve(Model204(), jnp.ones((2, 5)), 0.0, 1.0, params=params)


def test_forcing_system_mismatch():
    params = {k: jnp.full((2,), v) for k, v in NB_PARAMS.items()}
    forc = ForcingSet.from_series([np.zeros((4, 3), np.float32)], [60.0])
    with pytest.raises(ValueError, match="forcings cover"):
        solve(Model204(), jnp.ones((2, 5)), 0.0, 1.0, params=params, forcings=forc)


def test_unsorted_queries_rejected():
    with pytest.raises(ValueError, match="ascending"):
        solve(DummyModel(), jnp.ones((1, 5)), 0.0, 1.0, jnp.asarray([0.5, 0.2]))


def test_bad_span_and_backend():
    with pytest.raises(ValueError, match="greater than"):
        solve(DummyModel(), jnp.ones((1, 5)), 2.0, 1.0)
    with pytest.raises(ValueError, match="backend"):
        solve(DummyModel(), jnp.ones((1, 5)), 0.0, 1.0, backend="cuda")


@pytest.mark.slow
def test_fuzz_kernel_vs_vmap():
    """Random parameter/forcing draws: kernel and vmap paths must agree on
    completed lanes to f32 integration tolerance."""
    cfg = SolverConfig(rtol=1e-5, atol=1e-7, max_steps=30_000)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        s = 48
        params = {
            k: jnp.asarray(
                np.full(s, v) * rng.uniform(0.7, 1.4, s), jnp.float32
            )
            for k, v in NB_PARAMS.items()
        }
        pr = np.tile(rng.uniform(0, 0.002, (1, s)), (12, 1)).astype(np.float32)
        t2m = rng.uniform(1.0, 15.0, (1, s)).astype(np.float32)  # off melt kink
        forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
        y0 = jnp.asarray(
            np.abs(rng.normal(0.5, 0.5, (s, 5))) + 0.01, jnp.float32
        )
        h0 = jnp.full((s,), 1e-3, jnp.float32)
        ref = rk45_solve(Model204(), y0, 0.0, 720.0, None, params, forc, h0=h0, config=cfg)
        ker = rk45_solve_pallas(
            Model204(), y0, 0.0, 720.0, None, params, forc, h0=h0, config=cfg,
            interpret=True,
        )
        mask = ~(np.asarray(ref.stiff) | np.asarray(ker.stiff))
        assert mask.mean() > 0.9, f"seed {seed}: too many flagged lanes"
        np.testing.assert_allclose(
            np.asarray(ker.y_final)[mask],
            np.asarray(ref.y_final)[mask],
            rtol=5e-3,
            atol=1e-5,
            err_msg=f"seed {seed}",
        )
