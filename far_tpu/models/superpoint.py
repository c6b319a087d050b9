"""SuperPoint-style keypoint detector + descriptor (Flax, static shapes).

The reference's map-free SuperGlue path imports the non-vendored
magicleap submodule (crockwell/far: .gitmodules, mapfree_6dreg
lib/models/regression/model.py:103-128). This is the TPU-native
equivalent the rebuild must supply (SURVEY.md §7 hard part #7): a
VGG-style encoder with a 65-way cell detector head and a 256-d
descriptor head; NMS is a max-pool comparison and keypoint selection is
a fixed top-K (masked), so the whole detector jits.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    channels: Tuple[int, ...] = (64, 64, 128, 128)
    desc_dim: int = 256
    nms_radius: int = 4
    keypoint_threshold: float = 0.005
    max_keypoints: int = 1024
    dtype: str = "float32"


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Fast NMS: keep scores equal to their local max (SuperPoint's
    iterated suppression reduces to this under jit; one pass suffices
    for ranking into a top-K)."""
    k = 2 * radius + 1
    pooled = nn.max_pool(scores[..., None], (k, k), (1, 1),
                         padding=((radius, radius), (radius, radius)))
    return jnp.where(scores[..., None] == pooled, scores[..., None],
                     0.0)[..., 0]


class SuperPointTPU(nn.Module):
    cfg: SuperPointConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        """image: (B, H, W, 1) gray in [0, 1]; H, W divisible by 8.

        Returns:
            kpts (B, K, 2) <x, y> pixels, scores (B, K), valid (B, K),
            desc (B, K, D) L2-normalized.
        """
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        B, H, W, _ = image.shape
        x = image.astype(dt)

        c1, c2, c3, c4 = cfg.channels
        for i, (ch, pool) in enumerate(
                [(c1, False), (c1, True), (c2, False), (c2, True),
                 (c3, False), (c3, True), (c4, False), (c4, False)]):
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                                name=f"conv{i}")(x))
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
        # x: (B, H/8, W/8, c4)

        # detector head: 65 = 8*8 cell positions + dustbin
        det = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt,
                              name="det_a")(x))
        det = nn.Conv(65, (1, 1), dtype=dt, name="det_b")(det)
        logits = det.astype(jnp.float32)
        prob = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin
        hc, wc = H // 8, W // 8
        heat = prob.reshape(B, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4)
        heat = heat.reshape(B, H, W)

        heat = simple_nms(heat, cfg.nms_radius)
        # suppress borders (SuperPoint removes 4px borders)
        bm = jnp.zeros((H, W)).at[4:H - 4, 4:W - 4].set(1.0)
        heat = heat * bm[None]

        flat = heat.reshape(B, H * W)
        scores, idx = jax.lax.top_k(flat, cfg.max_keypoints)
        xs = (idx % W).astype(jnp.float32)
        ys = (idx // W).astype(jnp.float32)
        kpts = jnp.stack([xs, ys], -1)
        valid = scores > cfg.keypoint_threshold

        # descriptor head + bilinear sampling at keypoints
        desc = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt,
                               name="desc_a")(x))
        desc = nn.Conv(cfg.desc_dim, (1, 1), dtype=dt, name="desc_b")(desc)
        desc = desc.astype(jnp.float32)
        d = _bilinear_sample(desc, kpts / 8.0)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
        return kpts, scores, valid, d


def _bilinear_sample(fmap: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, h, w, C) at float coords xy (B, K, 2) <x, y>."""
    B, h, w, C = fmap.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    flat = fmap.reshape(B, h * w, C)

    def g(yy, xx):
        return jnp.take_along_axis(
            flat, (yy * w + xx)[..., None], axis=1)

    v = (g(y0, x0) * (1 - wx) * (1 - wy) + g(y0, x1) * wx * (1 - wy)
         + g(y1, x0) * (1 - wx) * wy + g(y1, x1) * wx * wy)
    return v
