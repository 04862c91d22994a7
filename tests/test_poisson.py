"""Screened-Poisson solver validation (SURVEY.md §5: closed-form round trip
+ dense numpy solve comparison)."""
import numpy as np

from gradientdomain_mitsuba_tpu.models import poisson


def _np_dx_matrix(H, W):
    n = H * W
    D = np.zeros((n, n))
    for i in range(H):
        for j in range(W - 1):
            k = i * W + j
            D[k, k] = -1
            D[k, k + 1] = 1
    return D


def _np_dy_matrix(H, W):
    n = H * W
    D = np.zeros((n, n))
    for i in range(H - 1):
        for j in range(W):
            k = i * W + j
            D[k, k] = -1
            D[k, k + W] = 1
    return D


def test_l2_exact_gradients_roundtrip():
    """If gx/gy are exactly the finite differences of P, the solution is P
    (for any alpha) — catches operator/adjoint sign errors."""
    rs = np.random.RandomState(0)
    P = rs.gamma(2.0, 0.5, (12, 17, 3)).astype(np.float32)
    gx = np.zeros_like(P)
    gy = np.zeros_like(P)
    gx[:, :-1] = P[:, 1:] - P[:, :-1]
    gy[:-1, :] = P[1:] - P[:-1]
    out = np.asarray(poisson.solve_l2(P, gx, gy, alpha=0.3, iters=200))
    np.testing.assert_allclose(out, P, atol=2e-4)


def test_l2_matches_dense_solve():
    rs = np.random.RandomState(1)
    H, W = 7, 9
    P = rs.uniform(0, 2, (H, W, 3)).astype(np.float32)
    gx = rs.normal(0, 0.3, (H, W, 3)).astype(np.float32)
    gy = rs.normal(0, 0.3, (H, W, 3)).astype(np.float32)
    gx[:, -1] = 0
    gy[-1, :] = 0
    alpha = 0.2

    Dx = _np_dx_matrix(H, W)
    Dy = _np_dy_matrix(H, W)
    A = Dx.T @ Dx + Dy.T @ Dy + alpha ** 2 * np.eye(H * W)
    out = np.asarray(poisson.solve_l2(P, gx, gy, alpha=alpha, iters=400))
    for c in range(3):
        b = (Dx.T @ gx[..., c].ravel() + Dy.T @ gy[..., c].ravel()
             + alpha ** 2 * P[..., c].ravel())
        x_ref = np.linalg.solve(A, b)
        np.testing.assert_allclose(out[..., c].ravel(), x_ref,
                                   atol=5e-3, rtol=1e-3)


def test_l1_roundtrip_and_robustness():
    """L1 also reproduces exact-gradient inputs, and is more robust than L2
    to a single corrupted gradient value."""
    rs = np.random.RandomState(2)
    P = rs.gamma(2.0, 0.5, (16, 16, 3)).astype(np.float32)
    gx = np.zeros_like(P)
    gy = np.zeros_like(P)
    gx[:, :-1] = P[:, 1:] - P[:, :-1]
    gy[:-1, :] = P[1:] - P[:-1]
    out = np.asarray(poisson.solve_l1(P, gx, gy, alpha=0.3))
    np.testing.assert_allclose(out, P, atol=2e-3)

    # corrupt one gradient sample (a "firefly")
    gx_bad = gx.copy()
    gx_bad[8, 8] += 50.0
    l2 = np.asarray(poisson.solve_l2(P, gx_bad, gy, alpha=0.2, iters=300))
    l1 = np.asarray(poisson.solve_l1(P, gx_bad, gy, alpha=0.2))
    err_l2 = np.abs(l2 - P).mean()
    err_l1 = np.abs(l1 - P).mean()
    assert err_l1 < err_l2 * 0.5, (err_l1, err_l2)


def test_reconstruct_adds_very_direct():
    P = np.ones((8, 8, 3), np.float32)
    z = np.zeros_like(P)
    vd = np.full_like(P, 2.0)
    out = np.asarray(poisson.reconstruct(
        dict(primal=P, dx=z, dy=z, very_direct=vd), mode="L2"))
    np.testing.assert_allclose(out, 3.0, atol=1e-3)
