"""Fused LoFTR encoder layer (Pallas TPU).

One kernel computes a whole LoFTREncoderLayer invocation (reference
crockwell/far: mp3d_loftr/src/loftr/loftr_module/transformer.py:12-67):

    q = elu(x Wq)+1; k = elu(src Wk)+1; v = src Wv / N
    per head: KV = k^T v, Z = 1/(q . sum(k)), msg = (q KV) * Z * N
    m   = LN1(msg Wm)
    out = x + LN2(relu([x | m] W0) W1)

Design notes (v5e):
- Everything for one batch element stays in VMEM; HBM traffic is x +
  source in, out out (the unfused XLA stack re-reads the 39 MB token
  tensors ~10x per layer).
- No per-head loops: the per-head KV contraction is one C x C matmul
  masked to its block diagonal, and the per-head normalizers ride two
  tiny 0/1 segment matmuls — head-count many small (d x d) ops would
  serialize on fixed op overheads.
- All big matmuls run bf16 on the MXU with f32 accumulation; LayerNorm
  runs f32 on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu1(x):
    """elu(x) + 1 without expm1 (unsupported in Pallas TPU lowering)."""
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _ln(x, scale, bias, eps=1e-5):  # torch LayerNorm default eps
    """LayerNorm over the last axis, f32 in/out."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, src_ref, wq_ref, wk_ref, wv_ref, wm_ref,
            ln1_ref, w0x_ref, w0m_ref, w1_ref, ln2_ref, out_ref,
            *, nhead: int, n: int, c: int):
    d = c // nhead
    f32 = jnp.float32

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    x = x_ref[0]      # (N, C) bf16
    src = src_ref[0]
    dt = x.dtype

    # head block-diagonal mask (C, C) and segment matrices (C, H)/(H, C)
    ri = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // d
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // d
    blockdiag = (ri == ci).astype(f32)
    sr = jax.lax.broadcasted_iota(jnp.int32, (c, nhead), 0) // d
    sc = jax.lax.broadcasted_iota(jnp.int32, (c, nhead), 1)
    seg = (sr == sc).astype(dt)          # (C, H)

    k = _elu1(mm(src, wk_ref[...])).astype(dt)          # (N, C)
    v = (mm(src, wv_ref[...]) * (1.0 / n)).astype(dt)
    kv = jax.lax.dot_general(
        k, v, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    kv = (kv * blockdiag).astype(dt)                     # (C, C) blockdiag
    ksum = jnp.sum(k.astype(f32), axis=0, keepdims=True)  # (1, C)

    q = _elu1(mm(x, wq_ref[...])).astype(dt)             # (N, C)
    # per-head normalizer: z[n, h] = 1 / sum_d q[n, hd] * ksum[hd]
    qk = q.astype(f32) * ksum                            # (N, C)
    z = 1.0 / jnp.maximum(mm(qk.astype(dt), seg), 1e-6)  # (N, H)
    zc = mm(z.astype(dt), jnp.swapaxes(seg, 0, 1))       # (N, C) broadcast
    msg = (mm(q, kv) * zc * float(n)).astype(dt)

    ln1 = ln1_ref[...]
    m = _ln(mm(msg, wm_ref[...]), ln1[0:1, :], ln1[1:2, :]).astype(dt)
    y = mm(x, w0x_ref[...]) + mm(m, w0m_ref[...])        # (N, 2C) f32
    y = jnp.maximum(y, 0.0).astype(dt)
    ln2 = ln2_ref[...]
    y = _ln(mm(y, w1_ref[...]), ln2[0:1, :], ln2[1:2, :])
    out_ref[0] = (x.astype(f32) + y).astype(dt)


def fused_loftr_layer_reference(x, source, params, nhead: int):
    """jnp reference of the same math (used on CPU / odd shapes)."""
    dt = x.dtype
    n = source.shape[1]

    def dense(a, w):
        return a @ w.astype(dt)

    B, L, C = x.shape
    d = C // nhead
    q = (jax.nn.elu(dense(x, params["wq"])) + 1.0).reshape(B, L, nhead, d)
    k = (jax.nn.elu(dense(source, params["wk"])) + 1.0
         ).reshape(B, n, nhead, d)
    v = (dense(source, params["wv"]) / n).reshape(B, n, nhead, d)
    kv = jnp.einsum("nshd,nshv->nhdv", k, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1)) + 1e-6)
    msg = jnp.einsum("nlhd,nhdv,nlh->nlhv", q, kv, z) * n
    msg = dense(msg.reshape(B, L, C).astype(dt), params["wm"])
    m = _ln(msg.astype(jnp.float32), params["ln1"][0], params["ln1"][1])
    y = dense(x, params["w0x"]) + dense(m.astype(dt), params["w0m"])
    y = jnp.maximum(y, 0.0)
    y = _ln(dense(y.astype(dt), params["w1"]).astype(jnp.float32),
            params["ln2"][0], params["ln2"][1])
    return (x.astype(jnp.float32) + y).astype(dt)


def fused_loftr_layer(x: jnp.ndarray, source: jnp.ndarray,
                      params: dict, nhead: int) -> jnp.ndarray:
    """One LoFTR encoder layer, fused.

    Args:
        x: (B, L, C) tokens; source: (B, S, C) (== x for self layers).
        params: dict of f32 arrays
            wq/wk/wv/wm: (C, C); w0x/w0m: (C, 2C); w1: (2C, C);
            ln1/ln2: (2, C) [scale; bias].
        nhead: head count (C % nhead == 0).
    Returns:
        (B, L, C) in x.dtype.
    """
    import os

    B, L, C = x.shape
    S = source.shape[1]
    on_cpu = jax.devices()[0].platform == "cpu"
    disabled = os.environ.get("FAR_TPU_FUSED_LOFTR", "1") == "0"
    if disabled or on_cpu or L != S or L < 1024 or L % 8 or C % 128 or C % nhead:
        return fused_loftr_layer_reference(x, source, params, nhead)

    dt = x.dtype
    cast = {k2: v.astype(dt) for k2, v in params.items()
            if k2 not in ("ln1", "ln2")}
    ln1 = params["ln1"].astype(jnp.float32)
    ln2 = params["ln2"].astype(jnp.float32)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, nhead=nhead, n=L, c=C),
        out_shape=jax.ShapeDtypeStruct((B, L, C), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C, C)), full((C, C)), full((C, C)), full((C, C)),
            full((2, C)),
            full((C, 2 * C)), full((C, 2 * C)), full((2 * C, C)),
            full((2, C)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 110),
        ),
    )(x, source, cast["wq"], cast["wk"], cast["wv"], cast["wm"], ln1,
      cast["w0x"], cast["w0m"], cast["w1"], ln2)


def _dispatch(x, source, params, nhead):
    # Tiny windows (L <= 32) are served by the MXU-batched tiny-window
    # path in models/attention.py, not a fused kernel: two fused window
    # kernel designs (w-major block-diagonal, s-major token-loop) both
    # lost to XLA at the fine shapes and were deleted — see git history
    # (ops/loftr_layer.py pre-r3) before attempting a third.
    return fused_loftr_layer(x, source, params, nhead)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def loftr_layer_auto(x: jnp.ndarray, source: jnp.ndarray,
                     params: dict, nhead: int) -> jnp.ndarray:
    """Kernel-dispatched LoFTR encoder layer with a reference backward.

    Forward runs the fused Pallas kernel appropriate for the shape
    (long coarse token sets / tiny fine windows) or the jnp reference on
    CPU. pallas_call has no autodiff rule, so the VJP differentiates the
    jnp reference instead — gradients are the reference-path gradients,
    which the kernels match to bf16 tolerance.
    """
    return _dispatch(x, source, params, nhead)


def _auto_fwd(x, source, params, nhead):
    return _dispatch(x, source, params, nhead), (x, source, params)


def _auto_bwd(nhead, res, g):
    x, source, params = res
    _, vjp = jax.vjp(
        lambda a, b, p: fused_loftr_layer_reference(a, b, p, nhead),
        x, source, params)
    return vjp(g)


loftr_layer_auto.defvjp(_auto_fwd, _auto_bwd)
