"""Fused Pallas RK45 kernel vs the vmap reference path (interpreter mode).

Same controller logic, but the two programs fuse float ops differently, so a
lane whose error estimate sits exactly on the accept boundary can diverge by
a step — step counts are compared within +-2 on <5% of lanes, states to f32
tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiger_tpu.forcing import ForcingSet
from tiger_tpu.kernels.rk45_pallas import rk45_solve_pallas
from tiger_tpu.models import DummyModel, Model204
from tiger_tpu.solver import SolverConfig, rk45_solve

CFG = SolverConfig(rtol=1e-5, atol=1e-7, max_steps=20_000)


def _assert_steps_close(a, b, rel=0.25, mask=None):
    # Step-count agreement: one boundary-rounding flip cascades through the
    # controller (and 204's min/max kinks amplify it), so compare counts
    # within a relative band, not exactly.  ``mask`` excludes lanes that sit
    # on a physical kink (e.g. melt threshold) where the two paths may even
    # disagree on the stiffness flag.
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    if mask is not None:
        a, b = a[mask], b[mask]
    bad = np.abs(a - b) > np.maximum(5, rel * b)
    assert not bad.any(), (a[bad], b[bad])


def _dummy_batch(s_count):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.5, 2.0, (s_count, 5)), jnp.float32)


def test_dummy_matches_vmap_path():
    y0 = _dummy_batch(96)
    qt = jnp.linspace(0.5, 5.0, 10, dtype=jnp.float32)
    h0 = jnp.full((96,), 0.05, jnp.float32)
    ref = rk45_solve(DummyModel(), y0, 0.0, 5.0, qt, h0=h0, config=CFG)
    ker = rk45_solve_pallas(
        DummyModel(), y0, 0.0, 5.0, qt, h0=h0, config=CFG, interpret=True
    )
    _assert_steps_close(ker.stats.n_attempts, ref.stats.n_attempts)
    np.testing.assert_allclose(
        np.asarray(ker.y_final), np.asarray(ref.y_final), rtol=2e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ker.dense), np.asarray(ref.dense), rtol=2e-5, atol=1e-6
    )
    assert not bool(np.asarray(ker.stiff).any())


def test_model204_with_forcings_matches_vmap_path():
    from tests.test_model204 import NB_PARAMS

    s_count = 64
    rng = np.random.default_rng(3)
    params = {
        k: jnp.asarray(np.full(s_count, v) * rng.uniform(0.9, 1.1, s_count), jnp.float32)
        for k, v in NB_PARAMS.items()
    }
    # Time-CONSTANT forcings (varying across systems): divergent-but-valid
    # step sequences then see identical forcing values, so the two paths
    # agree to integration accuracy.  (Time-varying forcing adds an O(h)
    # ZOH sampling difference whenever step sequences differ — covered by
    # test_time_varying_forcing_smoke.)
    pr = np.tile(rng.uniform(0, 0.0015, (1, s_count)), (24, 1)).astype(np.float32)
    t2m = rng.uniform(-2, 10, (1, s_count)).astype(np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray([0.01, 3.0, 0.0, 5.0, 0.2], jnp.float32), (s_count, 1))
    qt = jnp.arange(0.0, 1441.0, 120.0, dtype=jnp.float32)
    h0 = jnp.full((s_count,), 1e-3, jnp.float32)

    ref = rk45_solve(
        Model204(), y0, 0.0, 1440.0, qt, params, forc, h0=h0, config=CFG
    )
    ker = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, qt, params, forc, h0=h0, config=CFG, interpret=True
    )
    mask = ~(np.asarray(ref.stiff) | np.asarray(ker.stiff))
    # At most a couple of melt-threshold lanes may disagree on stiffness.
    assert (np.asarray(ref.stiff) != np.asarray(ker.stiff)).sum() <= 2
    # Lanes with temperature at the melt threshold integrate across a
    # discontinuity every step; their step counts are chaotic (though both
    # trajectories remain tolerance-valid) — exclude them from step parity.
    off_kink = np.abs(t2m[0]) > 0.5
    _assert_steps_close(ker.stats.n_attempts, ref.stats.n_attempts, mask=mask & off_kink)
    # Different (both tolerance-valid) step sequences accumulate global error
    # well above the local rtol through 204's min/max kinks.
    np.testing.assert_allclose(
        np.asarray(ker.y_final)[mask], np.asarray(ref.y_final)[mask], rtol=5e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ker.dense)[mask], np.asarray(ref.dense)[mask], rtol=5e-3, atol=1e-5
    )


def test_time_varying_forcing_smoke():
    # With hourly-varying rain the two paths' step sequences sample the ZOH
    # forcing differently; assert only physical-level agreement.
    from tests.test_model204 import NB_PARAMS

    s_count = 32
    rng = np.random.default_rng(4)
    params = {k: jnp.full((s_count,), v, jnp.float32) for k, v in NB_PARAMS.items()}
    pr = rng.uniform(0, 0.0015, (24, s_count)).astype(np.float32)
    t2m = np.full((1, s_count), 8.0, np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray([0.01, 3.0, 0.0, 5.0, 0.2], jnp.float32), (s_count, 1))
    h0 = jnp.full((s_count,), 1e-3, jnp.float32)
    ref = rk45_solve(Model204(), y0, 0.0, 1440.0, None, params, forc, h0=h0, config=CFG)
    ker = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, None, params, forc, h0=h0, config=CFG, interpret=True
    )
    mask = ~(np.asarray(ref.stiff) | np.asarray(ker.stiff))
    np.testing.assert_allclose(
        np.asarray(ker.y_final)[mask], np.asarray(ref.y_final)[mask], rtol=0.08, atol=1e-5
    )


def test_no_queries_path():
    y0 = _dummy_batch(32)
    ker = rk45_solve_pallas(DummyModel(), y0, 0.0, 5.0, None, config=CFG, interpret=True)
    ref = rk45_solve(DummyModel(), y0, 0.0, 5.0, None, config=CFG)
    np.testing.assert_allclose(
        np.asarray(ker.y_final), np.asarray(ref.y_final), rtol=2e-5, atol=1e-7
    )
    assert ker.dense.shape == (32, 0, 5)


def test_non_default_state_dimension():
    # Kernel is generic over N_EQ (tuple-of-2D state); 2-equation model.
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Osc2:
        N_EQ: int = 2
        UID: int = 96

        def rhs_tuple(self, t, y, p, f=None):
            return (y[1], -y[0] - 0.1 * y[1])

        def rhs(self, t, y, p, f=None):
            return jnp.stack(self.rhs_tuple(t, y, p, f))

    y0 = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (40, 1))
    h0 = jnp.full((40,), 0.01, jnp.float32)
    qt = jnp.asarray([5.0, 10.0], jnp.float32)
    ker = rk45_solve_pallas(Osc2(), y0, 0.0, 10.0, qt, h0=h0, config=CFG, interpret=True)
    ref = rk45_solve(Osc2(), y0, 0.0, 10.0, qt, h0=h0, config=CFG)
    np.testing.assert_allclose(
        np.asarray(ker.y_final), np.asarray(ref.y_final), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ker.dense), np.asarray(ref.dense), rtol=1e-4, atol=1e-6
    )


def test_failed_vs_stiff_semantics_match_vmap():
    # Contract (solver/rk45.py:259-261): max_steps-capped lanes report
    # failed=True AND stiff=True; criteria-stiff lanes report failed=False.
    # Round 1 folded kernel failures into stiff (failed always False).
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Decay2:
        N_EQ: int = 2
        UID: int = 97

        def rhs_tuple(self, t, y, p, f=None):
            return (p["lam"] * (y[0] - 1.0), -0.5 * y[1])

        def rhs(self, t, y, p, f=None):
            return jnp.stack(self.rhs_tuple(t, y, p, f))

    # Case 1: smooth lanes that cannot finish within max_steps -> failed.
    cfg_cap = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=5, max_scale=1.0)
    y0 = jnp.full((8, 2), 2.0, jnp.float32)
    params = {"lam": jnp.full((8,), -0.2, jnp.float32)}
    h0 = jnp.full((8,), 1e-3, jnp.float32)
    ref = rk45_solve(Decay2(), y0, 0.0, 50.0, None, params, h0=h0, config=cfg_cap)
    ker = rk45_solve_pallas(
        Decay2(), y0, 0.0, 50.0, None, params, h0=h0, config=cfg_cap, interpret=True
    )
    for r in (ref, ker):
        assert np.asarray(r.failed).all(), "max_steps cap must set failed"
        assert np.asarray(r.stiff).all(), "failed lanes also feed the Radau pass"

    # Case 2: genuinely stiff lanes (reject streak) -> stiff but NOT failed.
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=20_000)
    params_stiff = {"lam": jnp.asarray([-1e6, -0.2, -1e6, -0.3], jnp.float32)}
    y0s = jnp.full((4, 2), 2.0, jnp.float32)
    h0s = jnp.full((4,), 1e-3, jnp.float32)
    refs = rk45_solve(Decay2(), y0s, 0.0, 50.0, None, params_stiff, h0=h0s, config=cfg)
    kers = rk45_solve_pallas(
        Decay2(), y0s, 0.0, 50.0, None, params_stiff, h0=h0s, config=cfg, interpret=True
    )
    for r in (refs, kers):
        np.testing.assert_array_equal(np.asarray(r.stiff), [True, False, True, False])
        assert not np.asarray(r.failed).any(), "criteria-stiff lanes are not failures"


def test_query_auto_windowing_matches_unwindowed(monkeypatch):
    # Shrink the VMEM budget so 30 queries exceed it and the pipeline scans
    # query windows (carrying y and h across sub-intervals).  Must agree with
    # the unwindowed kernel to controller tolerance (the only difference is
    # one clamped step per window boundary).
    import tiger_tpu.kernels.rk45_pallas as kp

    y0 = _dummy_batch(16)
    qt = jnp.linspace(0.2, 5.0, 30, dtype=jnp.float32)
    h0 = jnp.full((16,), 0.05, jnp.float32)

    ref = rk45_solve_pallas(
        DummyModel(), y0, 0.0, 5.0, qt, h0=h0, config=CFG, interpret=True
    )

    monkeypatch.setattr(kp, "_VMEM_BUDGET", 438_000)
    assert kp._pick_tile_rows(30, 5, 1, 1) is None  # windowing engaged
    win = rk45_solve_pallas(
        DummyModel(), y0, 0.0, 5.0, qt, h0=h0, config=CFG, interpret=True
    )

    assert win.dense.shape == ref.dense.shape == (16, 30, 5)
    np.testing.assert_allclose(
        np.asarray(win.y_final), np.asarray(ref.y_final), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(win.dense), np.asarray(ref.dense), rtol=1e-4, atol=1e-6
    )
    assert not np.asarray(win.stiff).any() and not np.asarray(win.failed).any()
    # Step counts comparable (boundary clamps add ~1 step per window).
    _assert_steps_close(win.stats.n_attempts, ref.stats.n_attempts)


def test_windowing_with_forcings_and_t0_query(monkeypatch):
    # Model 204 + absolute-time forcing gathers + fill_t0 prefill across the
    # windowed path; vmap reference is ground truth.
    import tiger_tpu.kernels.rk45_pallas as kp
    from tests.test_model204 import NB_PARAMS

    s_count = 16
    rng = np.random.default_rng(11)
    params = {k: jnp.full((s_count,), v, jnp.float32) for k, v in NB_PARAMS.items()}
    pr = np.tile(rng.uniform(0, 0.0015, (1, s_count)), (24, 1)).astype(np.float32)
    t2m = np.full((1, s_count), 6.0, np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray([0.01, 3.0, 0.0, 5.0, 0.2], jnp.float32), (s_count, 1))
    qt = jnp.arange(0.0, 1441.0, 60.0, dtype=jnp.float32)  # 25 queries incl. t0
    h0 = jnp.full((s_count,), 1e-3, jnp.float32)

    ref = rk45_solve(Model204(), y0, 0.0, 1440.0, qt, params, forc, h0=h0, config=CFG)

    monkeypatch.setattr(kp, "_VMEM_BUDGET", 600_000)
    assert kp._pick_tile_rows(25, 5, forc.data.shape[0], len(params)) is None
    win = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, qt, params, forc, h0=h0, config=CFG,
        interpret=True,
    )
    assert not np.asarray(win.stiff).any()
    # t0 row prefilled with y0 (fill_t0_queries) in window 0 only.
    np.testing.assert_allclose(np.asarray(win.dense[:, 0, :]), np.asarray(y0))
    np.testing.assert_allclose(
        np.asarray(win.y_final), np.asarray(ref.y_final), rtol=5e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(win.dense), np.asarray(ref.dense), rtol=5e-3, atol=1e-5
    )


def test_fsal_matches_default_at_tolerance():
    # fsal=True reuses k7 as the next k1 (6 rhs evals/attempt instead of 7).
    # Non-parity: trajectories agree at tolerance level with the default.
    import dataclasses

    from tests.test_model204 import NB_PARAMS

    s_count = 32
    rng = np.random.default_rng(12)
    params = {k: jnp.full((s_count,), v, jnp.float32) for k, v in NB_PARAMS.items()}
    pr = np.tile(rng.uniform(0, 0.0015, (1, s_count)), (24, 1)).astype(np.float32)
    t2m = np.full((1, s_count), 7.0, np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray([0.01, 3.0, 0.0, 5.0, 0.2], jnp.float32), (s_count, 1))
    h0 = jnp.full((s_count,), 1e-3, jnp.float32)

    base = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, None, params, forc, h0=h0, config=CFG,
        interpret=True,
    )
    fsal = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, None, params, forc, h0=h0,
        config=dataclasses.replace(CFG, fsal=True), interpret=True,
    )
    mask = ~(np.asarray(base.stiff) | np.asarray(fsal.stiff))
    np.testing.assert_allclose(
        np.asarray(fsal.y_final)[mask], np.asarray(base.y_final)[mask],
        rtol=5e-3, atol=1e-6,
    )
    # Same order of work: attempt counts comparable.
    _assert_steps_close(fsal.stats.n_attempts, base.stats.n_attempts, mask=mask)


def test_fsal_no_spurious_flags_on_forcing_kinks():
    # Hour-to-hour varying rain: every ZOH boundary is a kink.  With forcing
    # frozen at step start, a naive FSAL carry goes stale across boundaries
    # (k1's forcing disagrees with k2..k7's) and the inconsistent error
    # estimate rejection-storms small-magnitude states into bogus stiff
    # flags (measured 6.5% of the 131k bench).  The kernel's boundary-
    # crossing carry refresh makes FSAL bit-identical to the default kernel
    # on this scenario: same flags (none), same attempt counts, same states.
    import dataclasses

    from tests.test_model204 import NB_PARAMS

    s_count = 64
    rng = np.random.default_rng(3)
    params = {
        k: jnp.asarray(np.full(s_count, v) * rng.uniform(0.9, 1.1, s_count),
                       jnp.float32)
        for k, v in NB_PARAMS.items()
    }
    pr = rng.uniform(0, 0.0015, (24, s_count)).astype(np.float32)
    t2m = rng.uniform(2.0, 10.0, (1, s_count)).astype(np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray([0.01, 3.0, 0.0, 5.0, 0.2], jnp.float32), (s_count, 1))
    h0 = jnp.full((s_count,), 1e-3, jnp.float32)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=50_000)

    base = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, None, params, forc, h0=h0, config=cfg,
        interpret=True,
    )
    fsal = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, None, params, forc, h0=h0,
        config=dataclasses.replace(cfg, fsal=True), interpret=True,
    )
    assert not np.asarray(base.stiff).any()
    assert not np.asarray(fsal.stiff).any(), "stale FSAL carry flagged lanes"
    np.testing.assert_array_equal(
        np.asarray(fsal.stats.n_attempts), np.asarray(base.stats.n_attempts)
    )
    np.testing.assert_array_equal(
        np.asarray(fsal.y_final), np.asarray(base.y_final)
    )


def test_fsal_unforced_dummy_accuracy():
    # Without forcing boundaries FSAL is exact DP-FSAL; must match the
    # default kernel to integration tolerance.
    import dataclasses

    y0 = _dummy_batch(32)
    h0 = jnp.full((32,), 0.05, jnp.float32)
    base = rk45_solve_pallas(DummyModel(), y0, 0.0, 5.0, None, h0=h0,
                             config=CFG, interpret=True)
    fsal = rk45_solve_pallas(DummyModel(), y0, 0.0, 5.0, None, h0=h0,
                             config=dataclasses.replace(CFG, fsal=True),
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(fsal.y_final), np.asarray(base.y_final), rtol=2e-5, atol=1e-7
    )


def test_kernel_bf16_forcing_close_to_f32():
    """forcing_dtype='bf16' quantizes only the forcing values: trajectories
    stay within the quantization-propagated tolerance of the f32 kernel."""
    import dataclasses

    from tests.test_model204 import NB_PARAMS

    s_count = 32
    rng = np.random.default_rng(5)
    params = {
        k: jnp.asarray(np.full(s_count, v) * rng.uniform(0.9, 1.1, s_count), jnp.float32)
        for k, v in NB_PARAMS.items()
    }
    pr = np.tile(rng.uniform(0, 0.0015, (1, s_count)), (24, 1)).astype(np.float32)
    t2m = rng.uniform(2, 10, (1, s_count)).astype(np.float32)
    forc = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])
    y0 = jnp.tile(jnp.asarray([0.01, 3.0, 0.0, 5.0, 0.2], jnp.float32), (s_count, 1))
    qt = jnp.arange(0.0, 1441.0, 360.0, dtype=jnp.float32)
    h0 = jnp.full((s_count,), 1e-3, jnp.float32)

    a = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, qt, params, forc, h0=h0, config=CFG,
        interpret=True,
    )
    cfg16 = dataclasses.replace(CFG, forcing_dtype="bf16")
    b = rk45_solve_pallas(
        Model204(), y0, 0.0, 1440.0, qt, params, forc, h0=h0, config=cfg16,
        interpret=True,
    )
    # bf16 forcing is a ~0.4% input perturbation; trajectories track within
    # a few percent through 204's kinks.
    np.testing.assert_allclose(
        np.asarray(b.y_final), np.asarray(a.y_final), rtol=4e-2, atol=1e-4
    )


def test_windowed_stiff_lanes_carry_not_reintegrated(monkeypatch):
    """A lane stiff-flagged in window k must stay flagged in later windows
    instead of re-integrating from NaN state (inflating attempt counts by
    ~max_rejects per window)."""
    import tiger_tpu.kernels.rk45_pallas as kp
    from tests.test_solve_device_rung import StiffMix

    s = 8
    lam = np.full(s, -0.05, np.float32)
    lam[2] = -1e7  # flags stiff almost immediately
    y0 = jnp.ones((s, 5), jnp.float32)
    params = {"lam": jnp.asarray(lam)}
    qt = jnp.linspace(1.0, 100.0, 30, dtype=jnp.float32)
    h0 = jnp.full((s,), 1e-3, jnp.float32)

    ref = rk45_solve_pallas(
        StiffMix(), y0, 0.0, 100.0, qt, params, h0=h0, config=CFG,
        interpret=True,
    )
    monkeypatch.setattr(kp, "_VMEM_BUDGET", 438_000)
    win = rk45_solve_pallas(
        StiffMix(), y0, 0.0, 100.0, qt, params, h0=h0, config=CFG,
        interpret=True,
    )
    assert np.asarray(ref.stiff)[2] and np.asarray(win.stiff)[2]
    # The flagged lane's attempts must not scale with the window count.
    att_ref = int(np.asarray(ref.stats.n_attempts)[2])
    att_win = int(np.asarray(win.stats.n_attempts)[2])
    assert att_win <= att_ref + 2
    # Healthy lanes unaffected.
    mask = lam > -1.0
    np.testing.assert_allclose(
        np.asarray(win.y_final)[mask], np.asarray(ref.y_final)[mask],
        rtol=1e-4, atol=1e-7,
    )


def test_dense_lockstep_matches_default():
    """dense_lockstep (opt-in; DESIGN.md round-5 dense-fill notes): the
    tile-uniform query-barrier must leave trajectories tolerance-equal to
    the default union-window fill, with only a handful of extra
    barrier-capped attempts, and identical stiff/failed flags."""
    import dataclasses

    from __graft_entry__ import _scenario
    from tiger_tpu.models import Model204

    s, tf = 16, 2880.0
    y0, params, forc = _scenario(s, jnp.float32, days=2.0, stiff_frac=0.0)
    qt = jnp.arange(0.0, tf + 1e-9, 360.0, dtype=jnp.float32)
    h0 = jnp.full((s,), 1e-3, jnp.float32)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, max_steps=100_000)
    base = rk45_solve_pallas(
        Model204(), y0, 0.0, tf, qt, params, forc, h0=h0, config=cfg,
        interpret=True,
    )
    lk = rk45_solve_pallas(
        Model204(), y0, 0.0, tf, qt, params, forc, h0=h0,
        config=dataclasses.replace(cfg, dense_lockstep=True), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(lk.stiff), np.asarray(base.stiff))
    np.testing.assert_array_equal(np.asarray(lk.failed), np.asarray(base.failed))
    np.testing.assert_allclose(
        np.asarray(lk.y_final), np.asarray(base.y_final), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lk.dense), np.asarray(base.dense), rtol=2e-3, atol=1e-5
    )
    a0 = int(np.asarray(base.stats.n_attempts).sum())
    a1 = int(np.asarray(lk.stats.n_attempts).sum())
    assert a1 <= a0 * 1.1 + 64, (a0, a1)  # barrier caps cost at most a few
