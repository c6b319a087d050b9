"""Linear (elu+1 feature map) and full attention primitives.

Behavioral equivalent of crockwell/far:
mp3d_loftr/src/loftr/loftr_module/linear_attention.py. The linear
variant is the reference's long-sequence mechanism (O(N) in the 4800
coarse tokens). These jnp paths serve the short-sequence cases (fine
5x5 windows via the tiny-window VPU branch below) and masked inputs;
for the long unmasked coarse stack, LoFTREncoderLayer dispatches the
whole layer (projections + linear attention + merge + MLP + norms) to
one fused Pallas kernel, far_tpu.ops.loftr_layer.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax.nn


def elu_feature_map(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """O(N) linear attention ("Transformers are RNNs").

    Args:
        q: (B, L, H, D); k/v: (B, S, H, D).
        q_mask: (B, L) bool; kv_mask: (B, S) bool.
    Returns:
        (B, L, H, D)
    """
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]

    v_length = v.shape[1]
    v = v / v_length  # matches reference fp16 guard; harmless in f32/bf16

    if q.shape[1] <= 32 and k.shape[1] <= 32:
        # Tiny-window path (fine-level 5x5 windows). Per-(batch, head)
        # (25,16)x(16,16) matmuls are far below MXU tile size; the VPU
        # broadcast-reduce alternative is HBM-bound (~16 ms of the fine
        # stage). Instead fold the heads back into the full C=h*d lane
        # axis and compute K^T V as ONE batched (C, s)x(s, C) matmul per
        # window — MXU-shaped (128 lanes, batch n) — then zero the
        # cross-head blocks with a constant (C, C) block-diagonal mask.
        # The 8x redundant cross-head FLOPs are free (the MXU was idle);
        # the layout never leaves (rows, 128) registers.
        # Isolated A/B at production fine shapes (n=16384, l=s=25, h=8,
        # d=16, bf16; scripts/bench_tiny_attention.py, fence-calibrated,
        # median of 3x30 dispatches): this branch 4.85 ms vs generic
        # per-head einsum 9.72 ms (2.00x) vs the quadratic-form
        # (phiQ phiK^T) V alternative 12.32 ms — the quadratic form
        # looks cheaper on paper (164 MB intermediate vs 537 MB) but
        # s=25 in the minor dim pads to 128 lanes, a 5x physical bloat.
        # Keep C=128 minor.
        n, l, h, d = Q.shape
        s = K.shape[1]
        C = h * d
        Qc = Q.reshape(n, l, C)
        Kc = K.reshape(n, s, C)
        Vc = v.reshape(n, s, C)
        eye = jnp.eye(h, dtype=jnp.float32)
        head_mask = jnp.kron(eye, jnp.ones((d, d), jnp.float32)).astype(
            Qc.dtype)
        KV = jnp.einsum("nsc,nsd->ncd", Kc, Vc) * head_mask  # (n, C, C)
        Ksum = jnp.sum(K, axis=1)                             # (n, h, d)
        Z = 1.0 / (jnp.sum(Q * Ksum[:, None], axis=-1) + eps)  # (n,l,h)
        out = jnp.einsum("nlc,ncd->nld", Qc, KV).reshape(n, l, h, d)
        return out * Z[..., None] * v_length

    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
    return out


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Standard softmax attention (the reference's FullAttention option)."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))
    logits = jnp.einsum("nlhd,nshd->nlsh", q, k) * scale
    if q_mask is not None and kv_mask is not None:
        mask = q_mask[:, :, None, None] & kv_mask[:, None, :, None]
        logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
    A = jax.nn.softmax(logits.astype(jnp.float32), axis=2).astype(q.dtype)
    return jnp.einsum("nlsh,nshd->nlhd", A, v)
