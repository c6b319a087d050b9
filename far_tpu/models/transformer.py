"""LoFTR encoder layers and the self/cross attention stack.

Equivalent of crockwell/far:
mp3d_loftr/src/loftr/loftr_module/transformer.py:12-112
(LoFTREncoderLayer, LocalFeatureTransformer).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from far_tpu.models.attention import full_attention, linear_attention


class LoFTREncoderLayer(nn.Module):
    """Pre-norm-free residual attention layer with a concat-FFN.

    message = norm1(merge(attn(q(x), k(src), v(src))))
    out     = x + norm2(mlp([x, message]))
    """

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        source: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        source_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, L, C = x.shape
        dim = self.d_model // self.nhead
        dense = lambda name: nn.Dense(self.d_model, use_bias=False,
                                      dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, L, self.nhead, dim)
        k = dense("k_proj")(source).reshape(B, -1, self.nhead, dim)
        v = dense("v_proj")(source).reshape(B, -1, self.nhead, dim)
        attn = linear_attention if self.attention == "linear" else full_attention
        message = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        message = dense("merge")(message.reshape(B, L, C))
        message = nn.LayerNorm(dtype=self.dtype, name="norm1")(message)

        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype,
                     name="mlp_0")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="mlp_1")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(y)
        return x + y


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross stack over two token sets."""

    d_model: int
    nhead: int
    layer_names: Sequence[str]
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat0: jnp.ndarray,
        feat1: jnp.ndarray,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
    ):
        for i, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype,
                name=f"layer_{i}_{name}",
            )
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(name)
        return feat0, feat1
