"""Homogeneous transforms and camera-normalization helpers.

Replaces crockwell/far: mp3d_loftr/third_party/prior_ransac/{linalg,utils}.py
(transform_points, homogeneous helpers) with batched jnp equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    """(..., N, D) -> (..., N, D+1) with a trailing 1."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def from_homogeneous(pts: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(..., N, D+1) -> (..., N, D), dividing by the last coordinate."""
    denom = pts[..., -1:]
    denom = jnp.where(jnp.abs(denom) < eps, jnp.where(denom < 0, -eps, eps), denom)
    return pts[..., :-1] / denom


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a projective transform to points.

    Args:
        T:   (..., D+1, D+1) or (..., D, D+1) transform.
        pts: (..., N, D) points.
    Returns:
        (..., N, D) transformed points.
    """
    ph = to_homogeneous(pts)  # (..., N, D+1)
    out = jnp.einsum("...ij,...nj->...ni", T, ph)
    if T.shape[-2] == pts.shape[-1]:  # affine (D, D+1): no divide
        return out
    return from_homogeneous(out)


def compose_pose34(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 3, 4)."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose34_to_44(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4)."""
    bottom = jnp.zeros(T.shape[:-2] + (1, 4), T.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([T, bottom], axis=-2)


def invert_pose34(T: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid (..., 3, 4) pose."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return compose_pose34(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def apply_pose34(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid (..., 3, 4) pose to (..., N, 3) points."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


def normalize_kpts_by_K(kpts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel keypoints -> normalized camera coordinates.

    Matches the reference front-end (crockwell/far:
    mp3d_loftr/src/utils/metrics.py:88-89): (kpt - c) / f, per axis.

    Args:
        kpts: (..., N, 2) pixel coordinates.
        K:    (..., 3, 3) intrinsics.
    """
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)[..., None, :]
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)[..., None, :]
    return (kpts - c) / f
