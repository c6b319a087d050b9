"""SimpleTransformer: correspondence-token pose regression baseline.

Equivalent of crockwell/far: mp3d_loftr/src/baselines/simple_transformer.py
(SimpleTransformer): NeRF-style frequency positional encoding of match
coordinates (optionally + per-match features), a vanilla transformer
encoder over the match tokens, global average pooling, and the same MoE
solver-fusion gate as the FAR EMM head.

Static-shape port: correspondences arrive padded to K with a validity
mask; padding tokens are masked out of attention and the average pool.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.models.constants import POSE_MEAN_6D, POSE_STD_6D, compute_normalized_6d


@dataclasses.dataclass(frozen=True)
class SimpleTransformerConfig:
    feat_size: int = 256
    num_heads: int = 8
    num_layers: int = 6
    num_bands: int = 10            # NeRF frequency bands
    use_pos_encoding: bool = True
    use_feats: bool = False        # append per-match LoFTR features
    cat_feats: bool = False
    use_2wt: bool = True
    use_1wt: bool = False
    scale_8pt: bool = True
    use_num_corres: bool = True
    hidden: int = 512
    dtype: str = "float32"


def nerf_positional_encoding(x: jnp.ndarray, num_bands: int) -> jnp.ndarray:
    """[x, sin(2^k x), cos(2^k x)] for k in 0..num_bands-1."""
    freqs = 2.0 ** np.arange(num_bands, dtype=np.float32)
    parts = [x]
    for f in freqs:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


class SimpleTransformer(nn.Module):
    cfg: SimpleTransformerConfig

    @nn.compact
    def __call__(
        self,
        corr: jnp.ndarray,             # (B, K, 2, 2) match coords <x, y> per image
        valid: jnp.ndarray,            # (B, K) bool
        solver_rt: jnp.ndarray,        # (B, 3, 4) solver pose
        num_corr: jnp.ndarray,         # (B,)
        feats: Optional[jnp.ndarray] = None,  # (B, K, 2, 256)
    ):
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        B, K = corr.shape[:2]

        pos = corr.reshape(B, K, 4).astype(jnp.float32)
        if cfg.use_pos_encoding:
            # the reference embeds 3-vectors; its match input is 4-d, so
            # the effective embed keeps all 4 dims per band
            pos = nerf_positional_encoding(pos, cfg.num_bands)
        fsize = cfg.feat_size * 3 // 4 if cfg.cat_feats else cfg.feat_size
        src = nn.Dense(fsize, dtype=dt, name="pos_proj")(pos.astype(dt))

        if cfg.use_feats and feats is not None:
            f = feats.reshape(B, K, -1).astype(dt)
            enc = cfg.feat_size // 4 if cfg.cat_feats else cfg.feat_size
            f = nn.relu(nn.Dense(enc, dtype=dt, name="feat_enc_0")(f))
            f = nn.Dense(enc, dtype=dt, name="feat_enc_1")(f)
            src = jnp.concatenate([src, f], -1) if cfg.cat_feats else src + f

        from far_tpu.models.sixdreg import TorchTransformerEncoderLayer

        x = src * valid[..., None]
        for i in range(cfg.num_layers):
            x = TorchTransformerEncoderLayer(
                cfg.feat_size, cfg.num_heads, dtype=dt,
                name=f"encoder_{i}")(x)

        # masked global average pool over valid tokens
        vf = valid.astype(jnp.float32)[..., None]
        pooled = jnp.sum(x.astype(jnp.float32) * vf, axis=1) / (
            jnp.sum(vf, axis=1) + 1e-6)

        sp = compute_normalized_6d(solver_rt)
        if cfg.use_num_corres:
            sp = jnp.concatenate([sp, num_corr[..., None] / 500.0], -1)

        enc = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name="moe_enc_0")(
            pooled.astype(dt)))
        enc = nn.Dense(cfg.hidden, dtype=dt, name="moe_enc_1")(enc)
        reg = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name="pose_0")(enc))
        pred = nn.Dense(9, dtype=dt, name="pose_1")(reg).astype(jnp.float32)

        gin = jnp.concatenate([pooled, pred, sp.astype(jnp.float32)], -1)
        g = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name="moe_0")(gin))
        g = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name="moe_1")(g))
        n_wt = 1 if cfg.use_1wt else (2 if cfg.use_2wt else 9)
        gate = nn.sigmoid(nn.Dense(n_wt, dtype=dt, name="moe_2")(g)
                          ).astype(jnp.float32)

        sp_t = sp[..., :3]
        if cfg.scale_8pt:
            sp_t = sp_t * (
                jnp.linalg.norm(pred[..., :3], axis=-1, keepdims=True)
                / (jnp.linalg.norm(sp_t, axis=-1, keepdims=True) + 1e-8))
        if cfg.use_2wt:
            w_t, w_r = gate[..., :1], gate[..., 1:2]
        elif cfg.use_1wt:
            w_t = w_r = gate[..., :1]
        else:
            w_t, w_r = gate[..., :3], gate[..., 3:]
        t = w_t * pred[..., :3] + (1 - w_t) * sp_t
        r = w_r * pred[..., 3:] + (1 - w_r) * sp[..., 3:9]
        return jnp.concatenate([t, r], -1), gate
