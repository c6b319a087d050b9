"""Depth-based keypoint warping for coarse supervision.

TPU port of crockwell/far: mp3d_loftr/src/loftr/utils/geometry.py:4-57
(warp_kpts): unproject via depth + K, rigid transform, reproject, and
check covisibility / depth consistency. Gathers replace the per-batch
python indexing loops.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _gather_depth(depth: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor depth lookup.

    Args:
        depth: (B, H, W); xy: (B, L, 2) integer pixel coords (x, y).
    Returns:
        (B, L) depths (0 outside the image).
    """
    H, W = depth.shape[-2:]
    x = jnp.clip(xy[..., 0], 0, W - 1)
    y = jnp.clip(xy[..., 1], 0, H - 1)
    flat = depth.reshape(depth.shape[0], -1)
    idx = y * W + x
    out = jnp.take_along_axis(flat, idx, axis=-1)
    inb = (xy[..., 0] >= 0) & (xy[..., 0] < W) & (xy[..., 1] >= 0) & (xy[..., 1] < H)
    return jnp.where(inb, out, 0.0)


def warp_kpts(
    kpts0: jnp.ndarray,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    T_0to1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    consistency_rel_err: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp kpts0 from image 0 into image 1 using depth0 and the pose.

    Args:
        kpts0: (B, L, 2) <x, y> pixel coordinates.
        depth0/depth1: (B, H, W).
        T_0to1: (B, 3, 4) or (B, 4, 4).
        K0/K1: (B, 3, 3).
    Returns:
        valid_mask: (B, L) bool (covisible + nonzero depth + consistent).
        w_kpts0:    (B, L, 2) warped <x, y> in image 1.
    """
    kpts0_long = jnp.round(kpts0).astype(jnp.int32)
    kpts0_depth = _gather_depth(depth0, kpts0_long)  # (B, L)
    nonzero_mask = kpts0_depth != 0

    # unproject
    kpts0_h = (
        jnp.concatenate([kpts0, jnp.ones_like(kpts0[..., :1])], axis=-1)
        * kpts0_depth[..., None]
    )  # (B, L, 3)
    kpts0_cam = jnp.einsum("bij,blj->bli", jnp.linalg.inv(K0), kpts0_h)

    # rigid transform
    R, t = T_0to1[:, :3, :3], T_0to1[:, :3, 3]
    w_kpts0_cam = jnp.einsum("bij,blj->bli", R, kpts0_cam) + t[:, None, :]
    w_kpts0_depth_computed = w_kpts0_cam[..., 2]

    # project
    w_kpts0_h = jnp.einsum("bij,blj->bli", K1, w_kpts0_cam)
    w_kpts0 = w_kpts0_h[..., :2] / (w_kpts0_h[..., 2:] + 1e-4)

    # covisibility
    h, w = depth1.shape[-2:]
    covisible = (
        (w_kpts0[..., 0] > 0)
        & (w_kpts0[..., 0] < w - 1)
        & (w_kpts0[..., 1] > 0)
        & (w_kpts0[..., 1] < h - 1)
    )
    w_kpts0_long = jnp.where(covisible[..., None], w_kpts0, 0.0).astype(jnp.int32)
    w_kpts0_depth = _gather_depth(depth1, w_kpts0_long)
    consistent = (
        jnp.abs((w_kpts0_depth - w_kpts0_depth_computed) / (w_kpts0_depth + 1e-8))
        < consistency_rel_err
    )
    valid = nonzero_mask & covisible & consistent
    return valid, w_kpts0
