"""Coefficient-level checks for the DP45 and Radau IIA tableaus."""

import numpy as np

from tiger_tpu.solver import tableau


def test_dp_row_sums_match_c():
    # Consistency: sum_j a[s][j] == c[s] for every stage.
    sums = tableau.DP_A.sum(axis=1)
    np.testing.assert_allclose(sums, tableau.DP_C, rtol=0, atol=1e-15)


def test_dp_weights_are_consistent():
    assert abs(tableau.DP_B.sum() - 1.0) < 1e-15
    assert abs(tableau.DP_B_ALT.sum() - 1.0) < 1e-15
    # FSAL structure: last a-row equals b.
    np.testing.assert_allclose(tableau.DP_A[6, :], tableau.DP_B[:-1].tolist() + [0.0], atol=1e-15)


def test_dp_order_conditions():
    # Classic order conditions through order 3 for the 5th-order weights.
    b, c = tableau.DP_B, tableau.DP_C
    a = tableau.DP_A
    assert abs(b @ c - 0.5) < 1e-14
    assert abs(b @ (c**2) - 1.0 / 3.0) < 1e-14
    assert abs(b @ (a @ c) - 1.0 / 6.0) < 1e-14


def test_dp_dense_endpoint_matches_b():
    # At theta=1 the quartic correction must reproduce the 5th-order solution:
    # sum_m P[j, m] == b[j].
    np.testing.assert_allclose(tableau.DP_P.sum(axis=1), tableau.DP_B, atol=1e-12)


def test_radau_row_sums_match_c():
    np.testing.assert_allclose(tableau.RADAU_A.sum(axis=1), tableau.RADAU_C, atol=1e-15)


def test_radau_weights():
    assert abs(tableau.RADAU_B.sum() - 1.0) < 1e-15
    # Reference quirk reproduced on purpose: the embedded weights do NOT sum
    # to 1 (radau_step_dense.cuh:73-77); see the note in tableau.py.
    assert abs(tableau.RADAU_B_ALT.sum() - (226.0 * 2 / 720.0 + 1.0 / 12.0)) < 1e-14
    # Radau IIA: last A-row equals b (stiffly accurate).
    np.testing.assert_allclose(tableau.RADAU_A[2], tableau.RADAU_B, atol=1e-15)
    # Order conditions
    b, c = tableau.RADAU_B, tableau.RADAU_C
    for p in range(1, 6):
        assert abs(b @ (c ** (p - 1)) - 1.0 / p) < 1e-13, p


def test_radau_dense_is_collocation_integral():
    # I_s(1) == b_s (checked at import too) and I_s(c_j) == A[j, s]:
    # integrating the collocation derivative to an interior node must
    # reproduce the Runge-Kutta stage relation Y_j = y + h sum_s A[j,s] Z_s.
    w = tableau.RADAU_DENSE
    c = tableau.RADAU_C
    for j in range(3):
        th = c[j]
        vals = w[:, 0] * th + w[:, 1] * th**2 + w[:, 2] * th**3
        np.testing.assert_allclose(vals, tableau.RADAU_A[j], atol=1e-13)


def test_radau_eigenbasis_solves_newton_system():
    # The transformed solve (tableau._radau_eig: u = (P (x) I) b, one real +
    # one complex n x n solve, dZ = V w + conj) must reproduce the direct
    # (I - h A (x) J)^{-1} b to machine precision for a general J — this is
    # the identity the fused kernel's Newton core relies on.
    rng = np.random.default_rng(7)
    n = 5
    jac = rng.normal(size=(n, n))
    h = 0.41
    m_big = np.eye(3 * n) - h * np.kron(tableau.RADAU_A, jac)
    b = rng.normal(size=(3, n))
    ref = np.linalg.solve(m_big, b.reshape(-1)).reshape(3, n)

    gam, alp, bet = (
        tableau.RADAU_EIG_GAMMA, tableau.RADAU_EIG_ALPHA, tableau.RADAU_EIG_BETA
    )
    p_mat, v_mat = tableau.RADAU_EIG_P, tableau.RADAU_EIG_V
    u1 = np.einsum("j,jn->n", p_mat[0].real, b)
    uc = np.einsum("j,jn->n", p_mat[1], b.astype(complex))
    w1 = np.linalg.solve(gam * np.eye(n) - h * jac, u1)
    wc = np.linalg.solve((alp + 1j * bet) * np.eye(n) - h * jac, uc)
    dz = np.stack(
        [v_mat[s, 0].real * w1 + 2.0 * np.real(v_mat[s, 1] * wc) for s in range(3)]
    )
    np.testing.assert_allclose(dz, ref, rtol=0, atol=1e-12)
    # The real eigenvalue IS the smoothed-error mu (the kernel reuses the
    # real factor for the 'radau5' estimate).
    assert abs(gam - tableau.RADAU_MU_REAL) < 1e-12
    # P row 0 is genuinely real (phase normalization) and the eigen pairs
    # satisfy A^{-1} v = lambda v.
    a_inv = np.linalg.inv(tableau.RADAU_A)
    np.testing.assert_allclose(a_inv @ v_mat[:, 0].real, gam * v_mat[:, 0].real, atol=1e-12)
    np.testing.assert_allclose(a_inv @ v_mat[:, 1], (alp + 1j * bet) * v_mat[:, 1], atol=1e-12)
