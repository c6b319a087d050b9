"""LoFTR encoder layers and the self/cross attention stack.

Equivalent of crockwell/far:
mp3d_loftr/src/loftr/loftr_module/transformer.py:12-112
(LoFTREncoderLayer, LocalFeatureTransformer).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from far_tpu.models.attention import full_attention, linear_attention
from far_tpu.ops.fine_layer import fine_transformer_auto
from far_tpu.ops.loftr_layer import loftr_layer_auto


class _Kernel(nn.Module):
    """Raw weight holder at the same path nn.Dense(use_bias=False) would
    use — the fused Pallas layer needs the kernels, not bound modules."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


def _layer_norm(x, scale, bias, eps=1e-5):
    """torch nn.LayerNorm semantics (eps 1e-5, the reference
    LoFTREncoderLayer default): statistics in f32, normalize
    arithmetic in the compute dtype (keeps the big elementwise pass
    at bf16 HBM cost)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    dt = x.dtype
    inv = jax.lax.rsqrt(var + eps).astype(dt)
    return (x - mu.astype(dt)) * inv * scale.astype(dt) + bias.astype(dt)


class LoFTREncoderLayer(nn.Module):
    """Pre-norm-free residual attention layer with a concat-FFN.

    message = norm1(merge(attn(q(x), k(src), v(src))))
    out     = x + norm2(mlp([x, message]))

    On TPU with linear attention over the long (coarse) token sets the
    whole layer runs as one fused Pallas kernel (far_tpu.ops.loftr_layer)
    — the unfused version pushes the 39 MB token tensors through HBM
    ~10x per layer. Other configurations use the reference-structured
    XLA path below; both share one parameter tree.
    """

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.d_model
        self.q_proj = _Kernel((C, C))
        self.k_proj = _Kernel((C, C))
        self.v_proj = _Kernel((C, C))
        self.merge = _Kernel((C, C))
        self.norm1 = _LNParams(C)
        self.mlp_0 = _Kernel((2 * C, 2 * C))
        self.mlp_1 = _Kernel((2 * C, C))
        self.norm2 = _LNParams(C)

    def raw(self) -> dict:
        """Raw parameter dict in the fused-kernel layout (the layer's
        single source of parameters; same tree paths as the original
        compact form: q_proj/kernel, norm1/scale, ...)."""
        C = self.d_model
        w0 = self.mlp_0()
        return {"wq": self.q_proj(), "wk": self.k_proj(),
                "wv": self.v_proj(), "wm": self.merge(),
                "w0x": w0[:C], "w0m": w0[C:], "w1": self.mlp_1(),
                "ln1": jnp.stack(self.norm1()),
                "ln2": jnp.stack(self.norm2())}

    def __call__(
        self,
        x: jnp.ndarray,
        source: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        source_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, L, C = x.shape
        dim = self.d_model // self.nhead
        p = self.raw()
        wq, wk, wv, wm = p["wq"], p["wk"], p["wv"], p["wm"]
        w0 = jnp.concatenate([p["w0x"], p["w0m"]], axis=0)
        w1 = p["w1"]
        ln1 = (p["ln1"][0], p["ln1"][1])
        ln2 = (p["ln2"][0], p["ln2"][1])

        # The fused kernel wins only on the long coarse token sets. The
        # tiny fine windows go through the fused window transformer in
        # ops/fine_layer.py (dispatched one level up where all layers'
        # params are visible); masked/odd shapes stay on the XLA path.
        if (self.attention == "linear" and x_mask is None
                and source_mask is None and x.shape == source.shape
                and L >= 1024 and L % 8 == 0 and C % 128 == 0):
            return loftr_layer_auto(x, source, p, self.nhead)

        dt = self.dtype
        dense = lambda a, w: a.astype(dt) @ w.astype(dt)
        # fuse the projections into one wide matmul (same params, same
        # math): x and source each make one pass instead of three — at
        # the fine shapes (204800 x 128 rows) the three narrow matmuls
        # are bandwidth-bound on re-reading the tokens
        if x is source:
            qkv = dense(x, jnp.concatenate([wq, wk, wv], axis=1))
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(x, wq)
            kv = dense(source, jnp.concatenate([wk, wv], axis=1))
            k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, L, self.nhead, dim)
        k = k.reshape(B, -1, self.nhead, dim)
        v = v.reshape(B, -1, self.nhead, dim)
        attn = linear_attention if self.attention == "linear" \
            else full_attention
        message = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        message = dense(message.reshape(B, L, C), wm)
        message = _layer_norm(message, *ln1)

        y = jnp.concatenate([x.astype(dt), message], axis=-1)
        y = nn.relu(dense(y, w0))
        y = dense(y, w1)
        y = _layer_norm(y, *ln2)
        return x + y


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross stack over two token sets.

    The reference applies cross layers sequentially (feat1's update
    consumes the already-updated feat0 — transformer.py:100-106), so
    cross cannot be batched without changing semantics. (Batching the
    two independent self-layer directions as one doubled batch was
    measured SLOWER on TPU — the concat/split HBM copies outweigh the
    saved launch — and removed; r4 A/B session.)"""

    d_model: int
    nhead: int
    layer_names: Sequence[str]
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32
    # tokens per independent window: set (by FineMatching) when the
    # (B, L, C) batch is really (windows, window_tokens, C) — enables
    # the fused whole-transformer window kernel (ops/fine_layer.py)
    window_tokens: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        feat0: jnp.ndarray,
        feat1: jnp.ndarray,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        layers = [
            LoFTREncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype,
                name=f"layer_{i}_{name}",
            )
            for i, name in enumerate(self.layer_names)
        ]
        for name in self.layer_names:
            if name not in ("self", "cross"):
                raise KeyError(name)

        # Training skips the fused window kernel entirely and runs the
        # plain layer loop: standard AD then picks the residuals and XLA
        # optimizes across the fwd/bwd boundary (a custom_vjp that
        # stashed the reference jax.vjp closure measured 13.6 pairs/s
        # at B=8 vs 14.2 for minimal-residual recompute — opaque
        # residuals are worse than letting the compiler choose).
        C = feat0.shape[-1]
        if (not train and self.window_tokens is not None and mask0 is None
                and mask1 is None and self.attention == "linear"
                and feat0.shape == feat1.shape
                and feat0.shape[1] == self.window_tokens
                and C == self.d_model and C % 128 == 0):
            params = [layer.raw() for layer in layers]
            return fine_transformer_auto(
                feat0.astype(self.dtype), feat1.astype(self.dtype),
                params, tuple(self.layer_names), self.nhead)

        for name, layer in zip(self.layer_names, layers):
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            else:  # cross
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
        return feat0, feat1
