"""Metric-scale pose solvers (map-free family).

TPU-native replacements for crockwell/far:
mapfree_6dreg/lib/models/matching/pose_solver.py:100-270:
- EssentialMatrixMetricSolverMEAN -> metric_scale_mean (mean 3D residual
  projected on t)
- EssentialMatrixMetricSolver -> metric_scale_ransac (1-D RANSAC over
  per-correspondence scales)
- PnPSolver (cv2.solvePnPRansac P3P + iterative refine) -> pnp_ransac:
  a batched DLT-PnP RANSAC. Per-hypothesis 12x12 smallest-eigenvector
  solves reuse the inverse-iteration path (no cv2, no per-pair python).

All functions are batched over pairs, statically shaped, masked.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from far_tpu.geometry.rotations import so3_project
from far_tpu.geometry.solvers import smallest_eigvec_power
from far_tpu.geometry.transforms import normalize_kpts_by_K
from far_tpu.geometry.warp import _gather_depth


def backproject_3d(kpts: jnp.ndarray, depth: jnp.ndarray,
                   K: jnp.ndarray) -> jnp.ndarray:
    """Pixels + depth -> camera-space 3D points.

    Args:
        kpts: (B, N, 2) pixel coords; depth: (B, N); K: (B, 3, 3).
    Returns:
        (B, N, 3).
    """
    xy = normalize_kpts_by_K(kpts, K)
    ones = jnp.ones_like(xy[..., :1])
    return jnp.concatenate([xy, ones], -1) * depth[..., None]


def _inlier_depths(kpts0, kpts1, depth0, depth1, inliers):
    d0 = _gather_depth(depth0, jnp.round(kpts0).astype(jnp.int32))
    d1 = _gather_depth(depth1, jnp.round(kpts1).astype(jnp.int32))
    valid = inliers & (d0 > 0) & (d1 > 0)
    return d0, d1, valid


def metric_scale_mean(
    R: jnp.ndarray, t: jnp.ndarray,
    kpts0: jnp.ndarray, kpts1: jnp.ndarray,
    depth0: jnp.ndarray, depth1: jnp.ndarray,
    K0: jnp.ndarray, K1: jnp.ndarray,
    inliers: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Metric translation via the mean 3D residual projected on t.

    Args:
        R: (B, 3, 3); t: (B, 3) unit; kpts: (B, N, 2) pixels;
        depth: (B, H, W); inliers: (B, N) bool.
    Returns:
        (t_metric (B, 3), ok (B,) bool).
    """
    d0, d1, valid = _inlier_depths(kpts0, kpts1, depth0, depth1, inliers)
    xyz0 = backproject_3d(kpts0, d0, K0)
    xyz1 = backproject_3d(kpts1, d1, K1)
    xyz0r = jnp.einsum("bij,bnj->bni", R, xyz0)

    w = valid.astype(jnp.float32)
    denom = jnp.sum(w, -1, keepdims=True) + 1e-8
    pmean0 = jnp.sum(xyz0r * w[..., None], 1) / denom
    pmean1 = jnp.sum(xyz1 * w[..., None], 1) / denom
    scale = jnp.sum((pmean1 - pmean0) * t, -1)
    ok = jnp.sum(w, -1) >= 1
    return t * scale[..., None] * ok[..., None], ok


def metric_scale_ransac(
    R: jnp.ndarray, t: jnp.ndarray,
    kpts0: jnp.ndarray, kpts1: jnp.ndarray,
    depth0: jnp.ndarray, depth1: jnp.ndarray,
    K0: jnp.ndarray, K1: jnp.ndarray,
    inliers: jnp.ndarray,
    scale_threshold: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Metric translation via 1-D RANSAC over per-correspondence scales.

    Each valid 3D-3D correspondence proposes scale_i = (xyz1 - R xyz0).t;
    the scale maximizing |{j : |scale_j - scale_i| < thr}| wins
    (reference pose_solver.py:151-209, vectorized to an (N, N) vote).
    Returns (t_metric, best_inlier_count, ok).
    """
    d0, d1, valid = _inlier_depths(kpts0, kpts1, depth0, depth1, inliers)
    xyz0 = backproject_3d(kpts0, d0, K0)
    xyz1 = backproject_3d(kpts1, d1, K1)
    xyz0r = jnp.einsum("bij,bnj->bni", R, xyz0)
    scales = jnp.sum((xyz1 - xyz0r) * t[:, None, :], -1)  # (B, N)

    w = valid.astype(jnp.float32)
    close = (
        jnp.abs(scales[:, :, None] - scales[:, None, :]) < scale_threshold
    ).astype(jnp.float32) * w[:, :, None] * w[:, None, :]
    votes = jnp.sum(close, axis=1)                      # (B, N)
    votes = jnp.where(valid, votes, -1.0)
    best = jnp.argmax(votes, axis=-1)
    best_scale = jnp.take_along_axis(scales, best[:, None], 1)[:, 0]
    best_votes = jnp.take_along_axis(votes, best[:, None], 1)[:, 0]
    ok = jnp.sum(w, -1) >= 1
    return (t * best_scale[..., None] * ok[..., None],
            jnp.maximum(best_votes, 0.0), ok)


# --------------------------------------------------------------------- #
# DLT-PnP RANSAC
# --------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class PnPConfig:
    num_hypotheses: int = 1024
    sample_size: int = 6
    reproj_thr_px: float = 3.0   # reference PNP.REPROJECTION_INLIER_THRESHOLD
    min_valid: int = 6
    max_t_norm: float = 1000.0   # degenerate-solution guard (reference :258)


def _dlt_pnp(X: jnp.ndarray, uv: jnp.ndarray,
             w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Direct linear transform PnP: 3D points + normalized 2D -> (..., 3, 4).

    Builds the 2N x 12 system [X 1 0 0 -u(X 1); 0 0 X 1 -v(X 1)], takes the
    smallest eigenvector of the 12x12 normal matrix (inverse iteration),
    fixes scale/sign, and projects the rotation part to SO(3).
    """
    u, v = uv[..., 0], uv[..., 1]
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)
    Xh = jnp.concatenate([X, ones[..., None]], -1)  # (..., N, 4)
    r1 = jnp.concatenate(
        [Xh, jnp.zeros_like(Xh), -u[..., None] * Xh], -1)  # (..., N, 12)
    r2 = jnp.concatenate(
        [jnp.zeros_like(Xh), Xh, -v[..., None] * Xh], -1)
    A = jnp.concatenate([r1, r2], -2)  # (..., 2N, 12)
    if w is not None:
        ww = jnp.concatenate([w, w], -1)[..., None]
        Aw = A * ww
    else:
        Aw = A
    M = jnp.einsum("...ni,...nj->...ij", Aw, A)
    p = smallest_eigvec_power(M)
    P = p.reshape(*p.shape[:-1], 3, 4)

    # scale so the rotation block has unit determinant-ish norm; fix sign
    # so most points have positive depth
    Rb = P[..., :3, :3]
    s = jnp.cbrt(jnp.abs(jnp.linalg.det(Rb)) + 1e-20)
    P = P / s[..., None, None]
    depths = jnp.einsum("...j,...nj->...n", P[..., 2, :3], X) \
        + P[..., 2, 3][..., None]
    sign = jnp.where(jnp.mean(jnp.sign(depths), -1) < 0, -1.0, 1.0)
    P = P * sign[..., None, None]

    R = so3_project(P[..., :3, :3])
    t = P[..., :3, 3]
    return jnp.concatenate([R, t[..., None]], -1)


def pnp_ransac(
    key: jax.Array,
    pts0: jnp.ndarray,      # (B, N, 2) pixels in image 0
    pts1: jnp.ndarray,      # (B, N, 2) pixels in image 1
    depth0: jnp.ndarray,    # (B, H, W)
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    valid: jnp.ndarray,     # (B, N)
    cfg: PnPConfig = PnPConfig(),
):
    """Batched DLT-PnP RANSAC: backproject image-0 points, solve pose of
    camera 1, score by reprojection error, refine on inliers.

    Returns (R (B,3,3), t (B,3), inlier count (B,), ok (B,)).
    """
    B, N, _ = pts0.shape
    d0 = _gather_depth(depth0, jnp.round(pts0).astype(jnp.int32))
    ok_pt = valid & (d0 > 0)
    X = backproject_3d(pts0, d0, K0)        # (B, N, 3)
    uv1 = normalize_kpts_by_K(pts1, K1)     # (B, N, 2)

    # sample hypotheses
    logw = jnp.where(ok_pt, 0.0, -jnp.inf)
    from far_tpu.solvers.ransac import _sample_indices

    idx = _sample_indices(key, logw, cfg.num_hypotheses, cfg.sample_size)
    take = lambda a: jnp.take_along_axis(a[:, None], idx[..., None], axis=2)
    P = _dlt_pnp(take(X), take(uv1))        # (B, H, 3, 4)

    # reprojection residuals in pixels
    f1 = jnp.stack([K1[..., 0, 0], K1[..., 1, 1]], -1)  # (B, 2)
    Xc = jnp.einsum("bhij,bnj->bhni", P[..., :3, :3], X) + P[..., None, :3, 3]
    proj = Xc[..., :2] / jnp.where(jnp.abs(Xc[..., 2:]) < 1e-6, 1e-6, Xc[..., 2:])
    err = jnp.linalg.norm(
        (proj - uv1[:, None]) * f1[:, None, None, :], axis=-1)  # (B, H, N)
    behind = Xc[..., 2] <= 0
    inl = (err < cfg.reproj_thr_px) & ~behind & ok_pt[:, None]
    score = jnp.sum(inl.astype(jnp.float32), -1)
    sane = jnp.linalg.norm(P[..., :3, 3], axis=-1) < cfg.max_t_norm
    score = jnp.where(sane & jnp.all(jnp.isfinite(P), (-1, -2)), score, -1.0)

    best = jnp.argmax(score, -1)
    gat = lambda a: jnp.take_along_axis(
        a, best.reshape(B, *([1] * (a.ndim - 1))), axis=1).squeeze(1)
    inl_best = gat(inl)

    # refine: weighted DLT over the inliers
    w = inl_best.astype(jnp.float32)
    enough = jnp.sum(w, -1, keepdims=True) >= cfg.min_valid
    w_safe = jnp.where(enough, w, ok_pt.astype(jnp.float32))
    P_ref = _dlt_pnp(X, uv1, w_safe)
    Xc = jnp.einsum("bij,bnj->bni", P_ref[..., :3, :3], X) + P_ref[..., None, :3, 3]
    proj = Xc[..., :2] / jnp.where(jnp.abs(Xc[..., 2:]) < 1e-6, 1e-6, Xc[..., 2:])
    err_ref = jnp.linalg.norm((proj - uv1) * f1[:, None, :], axis=-1)
    inl_ref = (err_ref < cfg.reproj_thr_px) & (Xc[..., 2] > 0) & ok_pt
    better = jnp.sum(inl_ref.astype(jnp.float32), -1) >= jnp.sum(w, -1)
    P_best = jnp.where(better[:, None, None], P_ref, gat(P))
    inl_final = jnp.where(better[:, None], inl_ref, inl_best)

    n_inl = jnp.sum(inl_final.astype(jnp.float32), -1)
    ok = (jnp.sum(ok_pt.astype(jnp.float32), -1) >= cfg.min_valid) & (n_inl >= 4)
    return P_best[..., :3, :3], P_best[..., :3, 3], n_inl, ok
