"""Ground-truth supervision construction (coarse conf matrix, fine offsets).

Equivalent of crockwell/far: mp3d_loftr/src/loftr/utils/supervision.py
(spvs_coarse, spvs_fine) under static shapes: the GT match list becomes
a dense (B, L, S) 0/1 matrix (the reference builds the same matrix at
supervision.py:113-114) and the fine GT is gathered at the predicted
match slots. The RT pseudo-GT (spvs_RT) is the on-device solver —
see far_tpu.solvers.

All functions are pure and meant to be wrapped in stop_gradient.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from far_tpu.geometry.warp import warp_kpts
from far_tpu.types import PairBatch


def _grid_pts(h: int, w: int, scale: float, B: int) -> jnp.ndarray:
    """(B, h*w, 2) pixel coordinates of the coarse cell corners."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w)
    pts = jnp.stack([gx, gy], axis=-1).reshape(1, h * w, 2) * scale
    return jnp.tile(pts, (B, 1, 1))


def coarse_supervision(
    batch: PairBatch,
    coarse_hw: Tuple[int, int],
    coarse_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build the GT coarse confidence matrix by bidirectional depth warp.

    Following the reference (supervision.py:79-116): warp the coarse grid
    of image0 into image1 and vice versa, round to cells, and mark (i, j)
    as positive when the mapping is a mutual nearest-neighbor loop.

    Returns:
        conf_gt: (B, L, S) float 0/1.
        w_pt0:   (B, L, 2) warped image-0 grid points (image-1 pixels),
                 for fine supervision.
        pt1:     (B, S, 2) image-1 grid points (pixels).
    """
    assert batch.depth0 is not None and batch.T_0to1 is not None
    B = batch.image0.shape[0]
    h, w = coarse_hw
    L = h * w

    scale0 = coarse_scale
    grid0 = _grid_pts(h, w, scale0, B)
    grid1 = _grid_pts(h, w, scale0, B)
    if batch.scale0 is not None:
        grid0 = grid0 * batch.scale0[:, None, :]
    if batch.scale1 is not None:
        grid1 = grid1 * batch.scale1[:, None, :]

    _, w_pt0 = warp_kpts(
        grid0, batch.depth0, batch.depth1, batch.T_0to1, batch.K0, batch.K1
    )
    _, w_pt1 = warp_kpts(
        grid1, batch.depth1, batch.depth0, batch.T_1to0, batch.K1, batch.K0
    )

    # map warped points to cells (divide out the per-pair resize first)
    w_pt0_c = w_pt0 / scale0
    w_pt1_c = w_pt1 / scale0
    if batch.scale1 is not None:
        w_pt0_c = w_pt0_c / batch.scale1[:, None, :]
    if batch.scale0 is not None:
        w_pt1_c = w_pt1_c / batch.scale0[:, None, :]

    def nearest_index(pts_c, wdim, hdim):
        r = jnp.round(pts_c).astype(jnp.int32)
        idx = r[..., 0] + r[..., 1] * wdim
        oob = (
            (r[..., 0] < 0) | (r[..., 0] >= wdim)
            | (r[..., 1] < 0) | (r[..., 1] >= hdim)
        )
        return jnp.where(oob, 0, idx)

    nearest1 = nearest_index(w_pt0_c, w, h)   # (B, L) image0 cell -> image1 cell
    nearest0 = nearest_index(w_pt1_c, w, h)   # (B, S) image1 cell -> image0 cell

    # mutual loop check: cell i -> j -> back to i
    loop = jnp.take_along_axis(nearest0, nearest1, axis=1)  # (B, L)
    correct = loop == jnp.arange(L)[None]
    correct = correct.at[:, 0].set(False)  # ignore top-left (0-depth dump)

    conf_gt = jnp.zeros((B, L, L), jnp.float32)
    b_idx = jnp.arange(B)[:, None] * jnp.ones((1, L), jnp.int32)
    i_idx = jnp.tile(jnp.arange(L)[None], (B, 1))
    conf_gt = conf_gt.at[b_idx, i_idx, nearest1].max(
        correct.astype(jnp.float32)
    )
    return conf_gt, w_pt0, grid1


def fine_supervision(
    w_pt0: jnp.ndarray,
    pt1: jnp.ndarray,
    i_ids: jnp.ndarray,
    j_ids: jnp.ndarray,
    fine_scale: float,
    window: int,
    scale1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GT sub-cell offsets at the predicted match slots.

    expec_f_gt = (w_pt0[i] - pt1[j]) / fine_scale / radius  (B, K, 2),
    following reference supervision.py:151-172.
    """
    radius = window // 2
    wp = jnp.take_along_axis(w_pt0, i_ids[..., None], axis=1)  # (B, K, 2)
    p1 = jnp.take_along_axis(pt1, j_ids[..., None], axis=1)
    scale = fine_scale if scale1 is None else fine_scale * scale1[:, None, :]
    return (wp - p1) / scale / radius
