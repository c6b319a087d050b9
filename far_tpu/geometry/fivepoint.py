"""Nister 5-point minimal solver, batched and TPU-native.

Replaces the reference's two 5-point paths (crockwell/far:
mp3d_loftr/third_party/prior_ransac/cv_geometry.py:836-859 cv2 call and
the symbolic polynomial port at :861-1040, itself the kornia/OpenCV
Nister pipeline) with a formulation built for batched static-shape XLA:

1.  The 4-dim nullspace of the 5x9 epipolar system comes from the
    orthogonal projector I - A^T (A A^T)^-1 A applied to a fixed random
    9x4 mix, then modified Gram-Schmidt — pure broadcast arithmetic, no
    per-sample SVD/QR (batched tiny SVD is pathologically slow on TPU).

2.  Instead of the classical hand-expanded Gauss-Jordan elimination of
    the 10x20 Nister matrix, we use hidden-variable elimination by
    EVALUATION/INTERPOLATION: with E(x,y,z) = x E1 + y E2 + z E3 + E4,
    the ten cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
    form C(z) m(x,y) = 0 with m the ten xy-monomials of degree <= 3.
    The column z-degree bounds (0,0,0,0,1,1,1,2,2,3) give
    deg det C(z) <= 10 — exactly Nister's degree-10 polynomial. We never
    form C(z) symbolically: its numeric value at any z is recovered from
    constraint evaluations at 10 fixed (x, y) nodes via a precomputed
    inverse Vandermonde, and det C(z) is sampled at 11 Chebyshev z-nodes
    (batched 10x10 pivoted Gaussian determinants) and interpolated.

3.  The ten (generally complex) roots come from a fixed-iteration
    Durand-Kerner sweep — simultaneous, fully vectorized, no
    data-dependent control flow, no eigendecomposition.

4.  For each near-real root z*, (x, y) are read off the nullvector of
    C(z*) via the existing inverse-iteration machinery
    (far_tpu.geometry.solvers.smallest_eigvec_power).

Every sample yields up to 10 essential-matrix candidates plus a validity
mask; RANSAC scores them all (far_tpu.solvers.ransac).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.geometry.solvers import (
    gauss_jordan_inverse,
    smallest_eigvec_power,
)

_EPS = 1e-12

# ---------------------------------------------------------------------- #
# fixed evaluation geometry (host numpy, computed once at import)
# ---------------------------------------------------------------------- #

# xy-monomial exponents for m(x, y) = (x^3, x^2 y, x y^2, y^3,
#                                      x^2, x y, y^2, x, y, 1)
_MONO_PX = np.array([3, 2, 1, 0, 2, 1, 0, 1, 0, 0])
_MONO_PY = np.array([0, 1, 2, 3, 0, 1, 2, 0, 1, 0])


def _pick_xy_nodes(n_try: int = 256) -> np.ndarray:
    """10 unisolvent (x, y) evaluation nodes with a well-conditioned
    cubic-monomial Vandermonde, chosen deterministically."""
    best, best_cond = None, np.inf
    for seed in range(n_try):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1.0, 1.0, (10, 2))
        V = (pts[:, :1] ** _MONO_PX) * (pts[:, 1:] ** _MONO_PY)
        c = np.linalg.cond(V)
        if c < best_cond:
            best, best_cond = pts, c
    return best


_XY_NODES = _pick_xy_nodes()                                   # (10, 2)
_V_XY = (_XY_NODES[:, :1] ** _MONO_PX) * (_XY_NODES[:, 1:] ** _MONO_PY)
# C(z) = Qvals @ V^-T, Qvals[i, j] = q_i(x_j, y_j, z)
_VINV_T = np.linalg.inv(_V_XY.astype(np.float64)).T.astype(np.float32)

# 11 Chebyshev z-nodes on [-1, 1] and the inverse Vandermonde mapping
# det-values -> monomial coefficients (f64 inverse, stored f32)
_Z_NODES = np.cos((2 * np.arange(11) + 1) / 22.0 * np.pi).astype(np.float64)
_W_Z = _Z_NODES[:, None] ** np.arange(11)[None, :]
_WINV_Z = np.linalg.inv(_W_Z).astype(np.float32)               # (11, 11)


def _basis_rotations(k: int) -> np.ndarray:
    """Fixed orthogonal 4x4 basis re-mixes (first = identity).

    A solution whose E4-coefficient is small sits at a huge |z| where the
    f32-interpolated degree-10 coefficients cannot pin it; re-running the
    elimination under a rotated nullspace basis moves every solution's
    (x, y, z) magnitude, so pooling candidates over a couple of fixed
    rotations recovers the distant ones.
    """
    rots = [np.eye(4)]
    rng = np.random.default_rng(11)
    for _ in range(k - 1):
        Q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
        rots.append(Q)
    return np.stack(rots).astype(np.float32)                   # (k, 4, 4)


# ---------------------------------------------------------------------- #
# batched small linear algebra
# ---------------------------------------------------------------------- #

def det_gauss_mixed(M: jnp.ndarray) -> jnp.ndarray:
    """Batched determinant, pivot-free: a fixed orthogonal row mix
    replaces partial pivoting.

    Partial pivoting costs an argmax + gather per elimination step —
    ~50 ms over the 36k 10x10 dets of a production 5-point solve, 10x the
    arithmetic itself. Pre-multiplying by a fixed orthogonal Q makes
    unpivoted elimination stable with overwhelming probability (rotated
    matrices have benign growth factors) and multiplies every det by the
    same constant det(Q) = +-1 — irrelevant, since the polynomial
    interpolation downstream is scale-invariant across z-nodes.

    Args:
        M: (..., n, n).
    Returns:
        (...,) determinants (up to the global det(Q) sign).
    """
    n = M.shape[-1]
    Q = _det_mix(n)
    # Component-wise elimination on n*n (...,)-shaped arrays: the
    # (..., n, n) layout puts only n=10 elements on the 128-lane axis;
    # unpacking to scalars-per-component keeps every op fully tiled.
    a = [[sum(float(Q[i, k]) * M[..., k, j] for k in range(n))
          for j in range(n)] for i in range(n)]
    det = jnp.ones(M.shape[:-2], M.dtype)
    for k in range(n):
        piv = a[k][k]
        det = det * piv
        inv_piv = jnp.where(jnp.abs(piv) < _EPS, 0.0, 1.0 / piv)
        for i in range(k + 1, n):
            f = a[i][k] * inv_piv
            for j in range(k + 1, n):
                a[i][j] = a[i][j] - f * a[k][j]
    return det


_DET_MIX_CACHE = {}


def _det_mix(n: int) -> np.ndarray:
    if n not in _DET_MIX_CACHE:
        Q, _ = np.linalg.qr(np.random.default_rng(3).normal(size=(n, n)))
        _DET_MIX_CACHE[n] = Q.astype(np.float32)
    return _DET_MIX_CACHE[n]


def det_gauss(M: jnp.ndarray) -> jnp.ndarray:
    """Batched determinant by unrolled Gaussian elimination with partial
    pivoting — broadcast arithmetic only, no XLA linalg primitive.

    Args:
        M: (..., n, n).
    Returns:
        (...,) determinants.
    """
    n = M.shape[-1]
    A = M
    rows = jnp.arange(n)
    det = jnp.ones(M.shape[:-2], M.dtype)
    for k in range(n):
        col = jnp.abs(A[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)                       # (...,)
        pk = p[..., None]
        perm = jnp.where(rows == k, pk,
                         jnp.where(rows == pk, k, rows))   # (..., n)
        A = jnp.take_along_axis(A, perm[..., None], axis=-2)
        det = jnp.where(p == k, det, -det)
        piv = A[..., k, k]
        det = det * piv
        inv_piv = jnp.where(jnp.abs(piv) < _EPS, 0.0, 1.0 / piv)
        factor = A[..., :, k] * inv_piv[..., None]          # (..., n)
        factor = factor * (rows > k).astype(M.dtype)
        A = A - factor[..., :, None] * A[..., k : k + 1, :]
    return det


def _nullspace4(A: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of the 4-dim nullspace of (..., 5, 9) by batched
    unrolled Householder QR of A^T.

    Orthogonal transforms keep the conditioning of A (a normal-equations
    projector would square it — fatal in f32). With A^T = Q R, the last
    four columns of Q span null(A). Returns (..., 9, 4).
    """
    M = jnp.swapaxes(A, -1, -2)                             # (..., 9, 5)
    batch = M.shape[:-2]
    Qt = jnp.broadcast_to(jnp.eye(9, dtype=A.dtype), batch + (9, 9))
    rows = jnp.arange(9)
    for k in range(5):
        xcol = M[..., :, k] * (rows >= k)                   # (..., 9)
        nrm = jnp.linalg.norm(xcol, axis=-1)
        xk = M[..., k, k]
        s = jnp.where(xk >= 0, 1.0, -1.0).astype(A.dtype)
        v = xcol + (s * nrm)[..., None] * (rows == k)
        vtv = jnp.sum(v * v, axis=-1)
        beta = jnp.where(vtv > _EPS, 2.0 / (vtv + _EPS), 0.0)
        vtM = jnp.einsum("...i,...ij->...j", v, M)
        M = M - beta[..., None, None] * v[..., :, None] * vtM[..., None, :]
        vtQ = jnp.einsum("...i,...ij->...j", v, Qt)
        Qt = Qt - beta[..., None, None] * v[..., :, None] * vtQ[..., None, :]
    # rows 5:9 of Q^T == columns 5:9 of Q
    return jnp.swapaxes(Qt[..., 5:9, :], -1, -2)            # (..., 9, 4)


# ---------------------------------------------------------------------- #
# constraint evaluation
# ---------------------------------------------------------------------- #

def _constraints_at(Ebasis: jnp.ndarray, x, y, z) -> jnp.ndarray:
    """The 10 Nister constraint values at scalar-field points.

    Args:
        Ebasis: (..., 4, 3, 3) nullspace basis (E1, E2, E3, E4).
        x, y, z: (..., P) evaluation coordinates.
    Returns:
        (..., P, 10): [det E, vec(2 E E^T E - tr(E E^T) E)].
    """
    coef = jnp.stack([x, y, z, jnp.ones_like(x)], axis=-1)  # (..., P, 4)
    # Unpack E's nine entries as (..., P) arrays and do all the matrix
    # algebra elementwise: batched (3, 3) matmuls tile to <1% of a TPU
    # (8, 128) register, while (..., P) broadcasts vectorize fully —
    # measured ~4x on the production 5-point solve.
    Eb = Ebasis.reshape(*Ebasis.shape[:-2], 9)               # (..., 4, 9)
    e = [jnp.einsum("...pk,...k->...p", coef, Eb[..., k])
         for k in range(9)]                                  # 9 x (..., P)
    E = [e[0:3], e[3:6], e[6:9]]

    # M = E E^T (symmetric): m[i][j] = sum_k E[i][k] * E[j][k]
    def dot3(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    m = [[dot3(E[i], E[j]) for j in range(3)] for i in range(3)]
    tr = m[0][0] + m[1][1] + m[2][2]
    # Ct[i][j] = 2 * sum_k m[i][k] E[k][j] - tr * E[i][j]
    ct = [
        2.0 * (m[i][0] * E[0][j] + m[i][1] * E[1][j] + m[i][2] * E[2][j])
        - tr * E[i][j]
        for i in range(3) for j in range(3)
    ]
    d = (
        E[0][0] * (E[1][1] * E[2][2] - E[1][2] * E[2][1])
        - E[0][1] * (E[1][0] * E[2][2] - E[1][2] * E[2][0])
        + E[0][2] * (E[1][0] * E[2][1] - E[1][1] * E[2][0])
    )
    return jnp.stack([d] + ct, axis=-1)                      # (..., P, 10)


def _c_of_z(Ebasis: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Numeric C(z) (..., Z, 10, 10) for a batch of z values (..., Z).

    Row i of C(z) holds the xy-monomial coefficients of constraint i at
    this z, recovered from evaluations at the 10 fixed (x, y) nodes.
    """
    Z = z.shape[-1]
    xy = jnp.asarray(_XY_NODES, z.dtype)                     # (10, 2)
    xs = jnp.broadcast_to(xy[:, 0], z.shape[:-1] + (Z, 10)).reshape(
        *z.shape[:-1], Z * 10)
    ys = jnp.broadcast_to(xy[:, 1], z.shape[:-1] + (Z, 10)).reshape(
        *z.shape[:-1], Z * 10)
    zs = jnp.repeat(z, 10, axis=-1)
    q = _constraints_at(Ebasis, xs, ys, zs)                  # (..., Z*10, 10)
    q = q.reshape(*z.shape[:-1], Z, 10, 10)                  # (..., Z, xy, ci)
    qvals = jnp.swapaxes(q, -1, -2)                          # (..., Z, ci, xy)
    return qvals @ jnp.asarray(_VINV_T, z.dtype)             # (..., Z, 10, 10)


# ---------------------------------------------------------------------- #
# degree-10 real roots by Durand-Kerner
# ---------------------------------------------------------------------- #

def durand_kerner_roots(coeffs: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """All complex roots of batched monic-izable degree-n polynomials.

    The polynomial is first balanced by the substitution z = s*u with
    s = max_k |c_k / c_n|^(1/(n-k)) (so every |u|-root is <= 2 by the
    Cauchy bound) — without this, a small leading coefficient makes the
    monic form explode and fixed-iteration DK diverges in f32.

    Args:
        coeffs: (..., n+1) with coeffs[..., d] the coefficient of z^d.
    Returns:
        (..., n) complex64 roots (garbage where the polynomial is
        degenerate — callers mask on the realness/magnitude checks).
    """
    n = coeffs.shape[-1] - 1
    lead = coeffs[..., -1:]
    safe = jnp.where(jnp.abs(lead) < 1e-20, 1e-20, lead)
    ratios = jnp.abs(coeffs[..., :-1] / safe)                # (..., n)
    k = jnp.arange(n)
    s = jnp.max(ratios ** (1.0 / (n - k)), axis=-1)
    s = jnp.clip(s, 1e-6, 1e6)[..., None]                    # (..., 1)
    powers = jnp.arange(n + 1)
    c = coeffs * s ** powers
    c = (c / c[..., -1:]).astype(jnp.complex64)              # monic in u

    angles = 2.0 * np.pi * (np.arange(n) + 0.37) / n
    init = 1.4 * jnp.exp(1j * jnp.asarray(angles, jnp.complex64))
    init = jnp.broadcast_to(init, coeffs.shape[:-1] + (n,))

    def body(_, w):
        # Horner evaluation: 10 complex fmas. (w ** powers lowers to
        # complex pow = log/exp per element — measured ~10x the cost of
        # the whole rest of the iteration.)
        pw = jnp.broadcast_to(c[..., None, -1], w.shape)
        for kk in range(n - 1, -1, -1):
            pw = pw * w + c[..., None, kk]
        diff = w[..., :, None] - w[..., None, :]             # (..., n, n)
        diff = diff + jnp.eye(n, dtype=w.dtype)              # self-term -> 1
        denom = jnp.prod(diff, axis=-1)
        step = pw / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        # scaled roots live in |u| <= 2; clamp steps against f32 blowups
        mag = jnp.abs(step)
        step = jnp.where(mag > 3.0, step * (3.0 / mag), step)
        return w - step

    u = jax.lax.fori_loop(0, iters, body, init)
    return u * s.astype(jnp.complex64)


# ---------------------------------------------------------------------- #
# the solver
# ---------------------------------------------------------------------- #

def _solve_from_basis(
    Ebasis: jnp.ndarray, real_tol: float, det_tol: float = 2.5e-2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to 10 essential candidates from a nullspace basis (..., 4, 3, 3)."""
    dtype = Ebasis.dtype
    batch = Ebasis.shape[:-3]

    # --- degree-10 polynomial p(z) = det C(z) by sampling + interpolation
    z_nodes = jnp.broadcast_to(jnp.asarray(_Z_NODES, dtype), batch + (11,))
    C_at_nodes = _c_of_z(Ebasis, z_nodes)                    # (..., 11, 10, 10)
    detvals = det_gauss_mixed(C_at_nodes)                    # (..., 11)
    # scale-normalize: det values can span a huge dynamic range in f32
    dmax = jnp.max(jnp.abs(detvals), axis=-1, keepdims=True) + _EPS
    coeffs = jnp.einsum(
        "dk,...k->...d", jnp.asarray(_WINV_Z, dtype), detvals / dmax)

    roots = durand_kerner_roots(coeffs)                      # (..., 10) complex
    re, im = jnp.real(roots), jnp.imag(roots)
    is_real = jnp.abs(im) <= real_tol * (1.0 + jnp.abs(re))
    z = re                                                   # (..., 10)

    # --- (x, y) from the nullvector of C(z*)
    Cz = _c_of_z(Ebasis, z)                                  # (..., 10, 10, 10)
    CtC = jnp.einsum("...ki,...kj->...ij", Cz, Cz)
    v = smallest_eigvec_power(CtC, iters=4)                  # (..., 10, 10)
    w = v[..., 9]
    finite_xy = jnp.abs(w) > 1e-6
    inv_w = jnp.where(finite_xy, 1.0 / jnp.where(finite_xy, w, 1.0), 0.0)
    x = v[..., 7] * inv_w
    y = v[..., 8] * inv_w

    coef = jnp.stack([x, y, z, jnp.ones_like(x)], axis=-1)   # (..., 10, 4)
    E = jnp.einsum("...rk,...kij->...rij", coef, Ebasis)     # (..., 10, 3, 3)
    nrm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E * (jnp.sqrt(jnp.asarray(2.0, E.dtype)) / (nrm + _EPS))

    # essential-manifold check on the normalized candidate: true roots
    # have det E ~ 0 (f32 noise level); spurious near-real DK roots that
    # survive the magnitude filters don't
    det_e = (
        E[..., 0, 0] * (E[..., 1, 1] * E[..., 2, 2]
                        - E[..., 1, 2] * E[..., 2, 1])
        - E[..., 0, 1] * (E[..., 1, 0] * E[..., 2, 2]
                          - E[..., 1, 2] * E[..., 2, 0])
        + E[..., 0, 2] * (E[..., 1, 0] * E[..., 2, 1]
                          - E[..., 1, 1] * E[..., 2, 0])
    )

    valid = (
        is_real
        & finite_xy
        & (jnp.abs(z) < 1e3) & (jnp.abs(x) < 1e3) & (jnp.abs(y) < 1e3)
        & (jnp.abs(det_e) < det_tol)
        & jnp.all(jnp.isfinite(E), axis=(-1, -2))
    )
    # keep the masked-out slots finite so downstream arithmetic (epipolar
    # residuals over ALL hypotheses before masking) never sees NaN/inf
    E = jnp.where(valid[..., None, None], jnp.nan_to_num(E),
                  jnp.eye(3, dtype=dtype))
    return E, valid


def run_5point_essential(
    points1: jnp.ndarray,
    points2: jnp.ndarray,
    real_tol: float = 5e-2,
    n_basis_rotations: int = 2,
    det_tol: float = 2.5e-2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nister 5-point solve on K-normalized correspondences.

    Args:
        points1/points2: (..., 5, 2) normalized camera coordinates, with
            the epipolar convention p2^T E p1 = 0.
        real_tol: relative imaginary-part tolerance for accepting a root.
        det_tol: |det E| acceptance threshold on sqrt(2)-normalized
            candidates; loosen per-dataset for high-noise/ill-conditioned
            scenes where a true root's residual det exceeds the default.
        n_basis_rotations: elimination passes under fixed basis re-mixes
            (candidates are pooled; see _basis_rotations).
    Returns:
        E: (..., 10 * n_basis_rotations, 3, 3) candidate essential
           matrices, Frobenius norm sqrt(2) where valid;
        valid: (..., 10 * n_basis_rotations) bool candidate mask.
    """
    x1, y1 = points1[..., 0], points1[..., 1]
    x2, y2 = points2[..., 0], points2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (..., 5, 9)

    basis = _nullspace4(A)                                   # (..., 9, 4)
    Ebasis = jnp.swapaxes(basis, -1, -2).reshape(*basis.shape[:-2], 4, 3, 3)

    rots = jnp.asarray(_basis_rotations(n_basis_rotations), A.dtype)
    # (..., R, 4, 3, 3): rotation dim rides as an extra batch axis
    Eb_r = jnp.einsum("rkm,...mij->...rkij", rots, Ebasis)
    E, valid = _solve_from_basis(Eb_r, real_tol, det_tol)    # (..., R, 10, ...)
    E = E.reshape(*E.shape[:-4], n_basis_rotations * 10, 3, 3)
    valid = valid.reshape(*valid.shape[:-2], n_basis_rotations * 10)
    return E, valid
