"""Minimal solvers: weighted 8-point, triangulation, cheirality, Procrustes.

TPU-native replacements for the reference's native codepaths:
- cv2.findEssentialMat / kornia run_8point
  (crockwell/far: mp3d_loftr/third_party/prior_ransac/cv_geometry.py:772-833)
- cv2.recoverPose (algorithm spec pasted at
  crockwell/far: mp3d_loftr/src/utils/cv2_fcns.py:147-319)
- procrustes (crockwell/far: mapfree_6dreg/lib/utils/solver.py:4-37)

Everything is batched over leading dims, statically shaped and masked:
invalid correspondences carry weight 0 instead of being dropped, so the
same compiled program serves any match count up to MAX_MATCHES.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from far_tpu.geometry.transforms import to_homogeneous

_EPS = 1e-8


def normalize_points(
    points: jnp.ndarray, weights: jnp.ndarray | None = None, eps: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley isotropic normalization, weight-aware.

    Shifts the (weighted) centroid to the origin and scales the mean
    distance to sqrt(2). Weights generalize the reference version so a
    validity mask can ride along under static shapes.

    Args:
        points:  (..., N, 2)
        weights: (..., N) nonnegative; None = uniform.
    Returns:
        (points_norm (..., N, 2), transform (..., 3, 3))
    """
    if weights is None:
        w = jnp.ones(points.shape[:-1], points.dtype)
    else:
        w = weights
    wsum = jnp.sum(w, axis=-1, keepdims=True) + eps
    mean = jnp.sum(points * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    dist = jnp.linalg.norm(points - mean, axis=-1)  # (..., N)
    scale = jnp.sum(dist * w, axis=-1, keepdims=True) / wsum  # (..., 1)
    scale = jnp.sqrt(jnp.asarray(2.0, points.dtype)) / (scale + eps)

    sx = scale[..., 0]
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    T = jnp.stack(
        [sx, zeros, -sx * mx, zeros, sx, -sx * my, zeros, zeros, ones], axis=-1
    ).reshape(*sx.shape, 3, 3)
    pts_n = (points - mean) * scale[..., None]
    return pts_n, T


def _smallest_eigvec_sym(M: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a symmetric (..., 9, 9)."""
    _, V = jnp.linalg.eigh(M)  # ascending eigenvalues
    return V[..., :, 0]


def gauss_jordan_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Batched small-matrix inverse by unrolled Gauss-Jordan (no pivoting).

    Intended for well-conditioned / ridge-regularized PSD systems where
    pivoting is unnecessary. Everything is broadcastable elementwise math
    — no XLA linalg primitive, which matters because batched tiny
    LU/eigh/SVD are pathologically slow on TPU.

    Args:
        M: (..., n, n).
    Returns:
        (..., n, n) inverse.
    """
    n = M.shape[-1]
    A = jnp.concatenate(
        [M, jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)], axis=-1
    )  # (..., n, 2n)
    for k in range(n):
        pivot_row = A[..., k : k + 1, :] / A[..., k : k + 1, k : k + 1]
        A = A - A[..., :, k : k + 1] * pivot_row
        A = A.at[..., k, :].set(pivot_row[..., 0, :])
    return A[..., :, n:]


def smallest_eigvec_power(M: jnp.ndarray, iters: int = 4,
                          ridge: float = 1e-6) -> jnp.ndarray:
    """Smallest eigenvector of a symmetric PSD matrix via inverse
    iteration — no eigh/SVD.

    Batched tiny eigendecompositions (the 32k 9x9 systems of the RANSAC
    minimal solves) are catastrophically slow through the TPU linalg
    path. Inverse iteration with a relative ridge converges at rate
    (lambda_min + eps) / (lambda_2 + eps) — effectively one step for the
    near-singular DLT normal matrices — and the Gauss-Jordan inverse is
    pure vectorized arithmetic. Inaccuracy in the f32 inverse is benign:
    inverse-iteration errors align with the target eigenvector.

    Args:
        M: (..., k, k) symmetric PSD.
    Returns:
        (..., k) unit eigenvector for the smallest eigenvalue.
    """
    k = M.shape[-1]
    dtype = M.dtype
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    eps = ridge * tr / k + 1e-30
    Minv = gauss_jordan_inverse(M + eps * jnp.eye(k, dtype=dtype))

    def matvec(A, x):
        return jnp.einsum("...ij,...j->...i", A, x)

    def normalize(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-20)

    # deterministic, non-axis-aligned init to avoid orthogonal starts
    v = normalize(jnp.ones(M.shape[:-1], dtype)
                  + 0.01 * jnp.arange(k, dtype=dtype))
    for _ in range(iters):
        v = normalize(matvec(Minv, v))
    return v


def run_8point(
    points1: jnp.ndarray,
    points2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    impl: str = "eigh",
    rank2_project: bool = True,
) -> jnp.ndarray:
    """Weighted normalized 8-point DLT -> rank-2 fundamental matrix.

    The normal-equations form X^T W X (9x9 symmetric eigendecomposition)
    replaces the (B, N, 9) SVD — it is much friendlier to the TPU for
    large hypothesis batches, and mathematically identical for the
    smallest singular vector.

    Args:
        points1/points2: (..., N, 2), N >= 8.
        weights: (..., N) or None.
        impl: 'eigh' (exact) or 'power' (shifted power iteration; the
            TPU-fast path for huge hypothesis batches).
        rank2_project: enforce rank 2 by SVD (skip on the TPU-fast path —
            the residual third singular value of a near-consistent sample
            is small and RANSAC scoring absorbs it).
    Returns:
        (..., 3, 3) fundamental matrices (unit Frobenius norm).
    """
    p1n, T1 = normalize_points(points1, weights)
    p2n, T2 = normalize_points(points2, weights)

    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    # row of the DLT system per correspondence: (..., N, 9)
    X = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    if weights is not None:
        Xw = X * weights[..., None]
    else:
        Xw = X
    XtX = jnp.einsum("...ni,...nj->...ij", Xw, X)  # (..., 9, 9)
    if impl == "power":
        f = smallest_eigvec_power(XtX)
    else:
        f = _smallest_eigvec_sym(XtX)
    F = f.reshape(*f.shape[:-1], 3, 3)

    if rank2_project:
        U, S, Vt = jnp.linalg.svd(F)
        S2 = S.at[..., 2].set(0.0)
        F = (U * S2[..., None, :]) @ Vt
    # un-normalize
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # scale-normalize (unit Frobenius) for stable downstream thresholds
    F = F / (jnp.linalg.norm(F, axis=(-2, -1), keepdims=True) + _EPS)
    return F


def run_8point_essential(
    points1: jnp.ndarray,
    points2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    impl: str = "eigh",
) -> jnp.ndarray:
    """Weighted 8-point on normalized camera coords -> essential matrix.

    With impl='eigh' the DLT solution is projected onto the essential
    manifold (singular values (1, 1, 0)), so ||E||_F = sqrt(2) exactly
    and E = [t]_x R holds with unit t. With impl='power' (the TPU fast
    path for large hypothesis batches) the SVD projection is skipped:
    the matrix is Frobenius-normalized to sqrt(2) and left near- rather
    than exactly-essential — downstream consumers use
    fast_motion_from_essential which tolerates that.
    """
    if impl == "power":
        F = run_8point(points1, points2, weights, impl="power",
                       rank2_project=False)
        return F * jnp.sqrt(jnp.asarray(2.0, F.dtype))
    F = run_8point(points1, points2, weights)
    U, _, Vt = jnp.linalg.svd(F)
    S = jnp.array([1.0, 1.0, 0.0], F.dtype)
    return (U * S) @ Vt  # U @ diag(1,1,0) @ Vt


def fast_decompose_essential(E: jnp.ndarray):
    """SVD-free essential decomposition via the adjugate identity.

    For an exact essential matrix E = [t]_x R with unit t:
        adj(E)^T = t t^T R
        [t]_x E  = (t t^T - I) R
    so  R1 = adj(E)^T - [t]_x E  and the twisted pair
        R2 = adj(E)^T + [t]_x E   (from E = [-t]_x R2).
    t is the unit null vector of E E^T, found by shifted power iteration
    (3x3, no SVD). For near-essential inputs (the power-iteration 8-point
    hypotheses) the returned matrices are orthonormalized via the 6D
    Gram-Schmidt map.

    Returns:
        (R1, R2, t) with shapes (..., 3, 3), (..., 3, 3), (..., 3).
    """
    from far_tpu.geometry.epipolar import cross_product_matrix
    from far_tpu.geometry.rotations import rotation_6d_to_matrix, matrix_to_rotation_6d

    # normalize scale so the adjugate identity holds (||E||_F = sqrt(2))
    En = E * (jnp.sqrt(jnp.asarray(2.0, E.dtype))
              / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + _EPS))
    EEt = En @ jnp.swapaxes(En, -1, -2)
    t = smallest_eigvec_power(EEt, iters=3)

    # adjugate of a 3x3: adj(A)[i,j] = cof(A)[j,i]
    a = En
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    cof = jnp.stack([c00, c01, c02, c10, c11, c12, c20, c21, c22], axis=-1)
    adjT = cof.reshape(*a.shape[:-2], 3, 3)  # adj(E)^T == cof(E)

    TxE = cross_product_matrix(t) @ En
    R1 = adjT - TxE
    R2 = adjT + TxE

    def orthonormalize(R):
        return rotation_6d_to_matrix(matrix_to_rotation_6d(R))

    return orthonormalize(R1), orthonormalize(R2), t


def fast_motion_from_essential(E: jnp.ndarray):
    """All four candidate motions from E, SVD-free (see
    fast_decompose_essential).

    Returns:
        Rs: (..., 4, 3, 3), ts: (..., 4, 3).
    """
    R1, R2, t = fast_decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def two_view_depths(
    R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form per-point depths for a calibrated two-view pair.

    With bearing vectors x1, x2 (homogeneous normalized coords) and the
    motion z2 x2 = z1 R x1 + t, crossing both sides with x2 gives
    0 = z1 (x2 x R x1) + (x2 x t), so the least-squares depth along ray 1 is
        z1 = -(x2 x t) . (x2 x R x1) / ||x2 x R x1||^2
    and z2 is the third coordinate of R (z1 x1) + t.

    This is the vectorized equivalent of the triangulate-then-read-depth
    step in cv2.recoverPose's cheirality test; only signs (and rough
    magnitudes) are needed there.

    Args:
        R: (..., 3, 3); t: (..., 3)
        x1/x2: (..., N, 2) normalized image coordinates.
    Returns:
        (z1, z2): (..., N) depths.
    """
    b1 = to_homogeneous(x1)  # (..., N, 3)
    b2 = to_homogeneous(x2)
    Rb1 = jnp.einsum("...ij,...nj->...ni", R, b1)
    c2t = jnp.cross(b2, t[..., None, :])  # broadcasts over candidates/points
    c2R = jnp.cross(b2, Rb1)
    z1 = -jnp.sum(c2t * c2R, axis=-1) / (jnp.sum(c2R * c2R, axis=-1) + eps)
    p2 = Rb1 * z1[..., None] + t[..., None, :]
    z2 = p2[..., 2]
    return z1, z2


def cheirality_counts(
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    distance_thresh: float = 1e9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Count points in front of both cameras for each candidate motion.

    Mirrors the cheirality vote of cv2.recoverPose (spec at
    crockwell/far: mp3d_loftr/src/utils/cv2_fcns.py:147-319) including the
    distanceThresh=1e9 far-point cutoff.

    Args:
        Rs: (..., C, 3, 3) candidate rotations.
        ts: (..., C, 3) candidate translations.
        x1/x2: (..., N, 2) normalized coords.
        weights: (..., N) optional mask.
    Returns:
        counts: (..., C) weighted in-front counts.
        good:   (..., C, N) boolean per-point cheirality.
    """
    z1, z2 = two_view_depths(
        Rs, ts, x1[..., None, :, :], x2[..., None, :, :]
    )  # (..., C, N)
    good = (z1 > 0) & (z2 > 0) & (z1 < distance_thresh) & (z2 < distance_thresh)
    w = jnp.ones_like(z1) if weights is None else weights[..., None, :]
    counts = jnp.sum(good.astype(x1.dtype) * w, axis=-1)
    return counts, good


def recover_pose_from_essential(
    E: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    distance_thresh: float = 1e9,
    method: str = "svd",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """E -> best (R, t) by the cheirality vote (recoverPose equivalent).

    Args:
        E: (..., 3, 3) essential matrix.
        x1/x2: (..., N, 2) normalized image coordinates.
        weights: (..., N) optional inlier mask for the vote.
    Returns:
        R: (..., 3, 3), t: (..., 3) (unit norm),
        n_good: (...,) winning vote count,
        good: (..., N) cheirality mask under the winning motion.
    """
    from far_tpu.geometry.epipolar import motion_from_essential

    if method == "fast":
        Rs, ts = fast_motion_from_essential(E)
    else:
        Rs, ts = motion_from_essential(E)  # (..., 4, 3, 3), (..., 4, 3)
    counts, good = cheirality_counts(Rs, ts, x1, x2, weights, distance_thresh)
    best = jnp.argmax(counts, axis=-1)
    take = lambda a, idx: jnp.take_along_axis(
        a, idx.reshape(idx.shape + (1,) * (a.ndim - idx.ndim)), axis=idx.ndim
    ).squeeze(idx.ndim)
    R = take(Rs, best)
    t = take(ts, best)
    n_good = take(counts, best)
    good_best = take(good, best)
    return R, t, n_good, good_best


def triangulate_points(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Batched DLT triangulation.

    Args:
        P1/P2: (..., 3, 4) projection matrices.
        x1/x2: (..., N, 2) image points (in the frame of P1/P2).
    Returns:
        (..., N, 3) triangulated 3D points.
    """
    def rows(P, x):
        # two rows per view: x*P3 - P1, y*P3 - P2
        P = P[..., None, :, :]  # (..., 1, 3, 4)
        r1 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r2 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r1, r2

    a1, a2 = rows(P1, x1)
    a3, a4 = rows(P2, x2)
    A = jnp.stack([a1, a2, a3, a4], axis=-2)  # (..., N, 4, 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    Xh = V[..., :, 0]  # (..., N, 4)
    return Xh[..., :3] / (Xh[..., 3:4] + jnp.where(Xh[..., 3:4] < 0, -_EPS, _EPS))


def procrustes(
    A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Kabsch: rigid (R, t) aligning A -> B.

    Solves argmin_{R,t} sum_i w_i ||R a_i + t - b_i||^2. Mirrors
    crockwell/far: mapfree_6dreg/lib/utils/solver.py:4-37.

    Args:
        A/B: (..., N, 3); weights: (..., N) optional.
    Returns:
        R: (..., 3, 3), t: (..., 3) with b ~= R a + t.
    """
    if weights is None:
        w = jnp.ones(A.shape[:-1], A.dtype)
    else:
        w = weights
    wsum = jnp.sum(w, axis=-1, keepdims=True) + _EPS
    ca = jnp.sum(A * w[..., None], axis=-2) / wsum
    cb = jnp.sum(B * w[..., None], axis=-2) / wsum
    A0 = A - ca[..., None, :]
    B0 = B - cb[..., None, :]
    H = jnp.einsum("...ni,...nj->...ij", A0 * w[..., None], B0)  # (..., 3, 3)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2)))
    D = jnp.ones(H.shape[:-2] + (3,), H.dtype).at[..., -1].set(det)
    R = jnp.einsum("...ji,...j,...jk->...ik", Vt, D, jnp.swapaxes(U, -1, -2))
    t = cb - jnp.einsum("...ij,...j->...i", R, ca)
    return R, t
