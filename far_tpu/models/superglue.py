"""SuperGlue-style attentional matcher with Sinkhorn assignment (Flax).

The TPU-native stand-in for the non-vendored
magicleap/SuperGluePretrainedNetwork submodule the reference's map-free
path depends on (SURVEY.md §7 hard part #7): keypoint MLP encoder,
alternating self/cross full attention over the (static K) keypoint
tokens, and the log-domain optimal transport with a learned dustbin
(sharing far_tpu.models.matching.log_sinkhorn). Match selection is
mutual-argmax over the assignment with a confidence threshold — all
static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from far_tpu.models.matching import log_sinkhorn


@dataclasses.dataclass(frozen=True)
class SuperGlueConfig:
    desc_dim: int = 256
    num_layers: int = 9          # self+cross rounds
    num_heads: int = 4
    sinkhorn_iterations: int = 20
    match_threshold: float = 0.2
    dtype: str = "float32"


class _MHA(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, source, x_valid, s_valid):
        B, N, C = x.shape
        h, d = self.heads, self.dim // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(source)
        v = nn.Dense(C, dtype=self.dtype, name="v")(source)
        q = q.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * d ** -0.5
        mask = s_valid[:, None, None, :]
        logits = jnp.where(mask, logits, -1e9)
        a = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v).transpose(0, 2, 1, 3)
        return nn.Dense(C, dtype=self.dtype, name="merge")(
            o.reshape(B, N, C))


class _GNNLayer(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, source, x_valid, s_valid):
        msg = _MHA(self.dim, self.heads, self.dtype, name="attn")(
            x, source, x_valid, s_valid)
        y = jnp.concatenate([x, msg], -1)
        y = nn.relu(nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(y))
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class SuperGlueTPU(nn.Module):
    cfg: SuperGlueConfig

    @nn.compact
    def __call__(
        self,
        kpts0: jnp.ndarray, scores0: jnp.ndarray, valid0: jnp.ndarray,
        desc0: jnp.ndarray,
        kpts1: jnp.ndarray, scores1: jnp.ndarray, valid1: jnp.ndarray,
        desc1: jnp.ndarray,
        image_hw: Tuple[int, int],
    ):
        """Returns (matches0 (B, K) int32 index into kpts1 or -1,
        mscores0 (B, K) confidence)."""
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        H, W = image_hw
        B, K, _ = kpts0.shape

        kenc = [nn.Dense(width, dtype=dt, name=f"kenc_{i}")
                for i, width in enumerate((32, 64, 128, 256, cfg.desc_dim))]

        def encode(kpts, scores, desc):
            # normalize coords to ~[-1, 1] (SuperGlue's normalization)
            size = jnp.asarray([W, H], jnp.float32)
            center = size / 2
            scale = 0.7 * jnp.max(size)
            p = (kpts - center) / scale
            enc = jnp.concatenate([p, scores[..., None]], -1).astype(dt)
            for i, layer in enumerate(kenc):
                enc = layer(enc)
                if i < len(kenc) - 1:
                    enc = nn.relu(enc)
            return desc.astype(dt) + enc

        # shared keypoint encoder (same weights both images)
        x0 = encode(kpts0, scores0, desc0)
        x1 = encode(kpts1, scores1, desc1)

        for i in range(cfg.num_layers):
            self_l = _GNNLayer(cfg.desc_dim, cfg.num_heads, dt,
                               name=f"self_{i}")
            cross_l = _GNNLayer(cfg.desc_dim, cfg.num_heads, dt,
                                name=f"cross_{i}")
            x0 = self_l(x0, x0, valid0, valid0)
            x1 = self_l(x1, x1, valid1, valid1)
            x0n = cross_l(x0, x1, valid0, valid1)
            x1n = cross_l(x1, x0, valid1, valid0)
            x0, x1 = x0n, x1n

        f0 = nn.Dense(cfg.desc_dim, dtype=dt, name="final_proj")(x0)
        f1 = nn.Dense(cfg.desc_dim, dtype=dt, name="final_proj2")(x1)
        scores = jnp.einsum(
            "bnd,bmd->bnm", f0.astype(jnp.float32), f1.astype(jnp.float32)
        ) / cfg.desc_dim ** 0.5
        scores = jnp.where(
            valid0[:, :, None] & valid1[:, None, :], scores, -1e9)

        bin_score = self.param(
            "bin_score", lambda key: jnp.asarray(1.0, jnp.float32))
        Z = log_sinkhorn(scores, bin_score, cfg.sinkhorn_iterations)
        P = jnp.exp(Z)[:, :-1, :-1]  # (B, K, K)

        # mutual argmax + threshold
        j = jnp.argmax(P, axis=2)
        i_back = jnp.argmax(P, axis=1)
        mutual = jnp.take_along_axis(i_back, j, axis=1) == \
            jnp.arange(K)[None]
        conf = jnp.max(P, axis=2)
        ok = mutual & (conf > cfg.match_threshold) & valid0
        matches0 = jnp.where(ok, j, -1).astype(jnp.int32)
        return matches0, jnp.where(ok, conf, 0.0)


def match_pair_superglue(sp_model, sp_vars, sg_model, sg_vars,
                         image0, image1):
    """Detector + matcher -> padded correspondence arrays.

    Returns (pts0 (B, K, 2), pts1 (B, K, 2), valid (B, K)).
    """
    k0, s0, v0, d0 = sp_model.apply(sp_vars, image0)
    k1, s1, v1, d1 = sp_model.apply(sp_vars, image1)
    m0, conf = sg_model.apply(
        sg_vars, k0, s0, v0, d0, k1, s1, v1, d1,
        image_hw=image0.shape[1:3])
    ok = m0 >= 0
    idx = jnp.maximum(m0, 0)
    pts1 = jnp.take_along_axis(k1, idx[..., None], axis=1)
    return k0 * ok[..., None], pts1 * ok[..., None], ok
