"""Golden-artifact parity: DummyModel vs the reference's final.csv / dense.csv.

BASELINE config #1 (CPU-runnable).  The artifacts were produced by the
reference GPU build with rtol=1e-6/atol=1e-9 and printed with 6 significant
digits; two independent rtol=1e-6 integrations agree to ~1e-5 relative, so the
parity tolerance is 1e-4 relative (dominated by print rounding + solver path
differences).  Grid semantics checked exactly: 10,000 queries at
t_q = (q+1)*5/10001 (dense.csv has no t=0 row — the reference skips queries at
the current step start, rk45_kernel.cu:142).
"""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from tiger_tpu.models import DummyModel
from tiger_tpu.solver import SolverConfig, solve

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def result(reference_dir):
    n_q = 10_000
    qt = (np.arange(1, n_q + 1) * 5.0) / 10_001.0
    y0 = jnp.ones((4, 5), jnp.float64)
    cfg = SolverConfig(fill_t0_queries=False)
    res = solve(DummyModel(), y0, 0.0, 5.0, jnp.asarray(qt), config=cfg)
    return qt, res


def test_final_csv_parity(reference_dir, result):
    _, res = result
    final = pd.read_csv(reference_dir / "src" / "final.csv").to_numpy()
    assert final.shape == (4, 5)
    ours = np.asarray(res.y_final)
    np.testing.assert_allclose(ours, final, rtol=1e-4, atol=1e-6)
    # Tight check on the canonical target values from BASELINE.md.
    target = np.array([1.91791, 1.90017, 2.39397, 1.71872, 3.06922])
    np.testing.assert_allclose(ours[0], target, rtol=5e-5, atol=1e-6)


def test_dense_csv_parity(reference_dir, result):
    qt, res = result
    df = pd.read_csv(reference_dir / "src" / "dense.csv")
    # Times printed with 6 significant digits in the artifact.
    np.testing.assert_allclose(df["time"].to_numpy(), qt, rtol=1e-5, atol=1e-9)
    ref = np.stack(
        [
            np.stack([df[f"Var{i}_sys{s}"].to_numpy() for i in range(5)], axis=-1)
            for s in range(4)
        ]
    )  # [4, Q, 5]
    ours = np.asarray(res.dense)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_no_stiff_systems(result):
    _, res = result
    assert res.n_stiff == 0
    assert not bool(np.asarray(res.failed).any())
