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


def run_8point(
    points1: jnp.ndarray,
    points2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Weighted normalized 8-point DLT -> rank-2 fundamental matrix.

    The normal-equations form X^T W X (9x9 symmetric eigendecomposition)
    replaces the (B, N, 9) SVD — it is much friendlier to the TPU for
    large hypothesis batches, and mathematically identical for the
    smallest singular vector.

    Args:
        points1/points2: (..., N, 2), N >= 8.
        weights: (..., N) or None.
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
    f = _smallest_eigvec_sym(XtX)
    F = f.reshape(*f.shape[:-1], 3, 3)

    # rank-2 projection
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
) -> jnp.ndarray:
    """Weighted 8-point on normalized camera coords -> essential matrix.

    Projects the DLT solution onto the essential manifold
    (singular values (1, 1, 0)), so ||E||_F = sqrt(2) exactly and the
    decomposition E = [t]_x R holds with unit-norm t.
    """
    F = run_8point(points1, points2, weights)
    U, _, Vt = jnp.linalg.svd(F)
    S = jnp.array([1.0, 1.0, 0.0], F.dtype)
    return (U * S) @ Vt  # U @ diag(1,1,0) @ Vt


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
