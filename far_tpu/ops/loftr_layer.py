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


def _window_kernel(x_ref, src_ref, wq_ref, wk_ref, wv_ref, wm_ref,
                   ln1_ref, w0x_ref, w0m_ref, w1_ref, ln2_ref, out_ref,
                   kf_ref, v_ref,
                   *, nhead: int, nb: int, s: int, c: int):
    """Fine-window variant, token-major ("s-major") layout.

    Blocks arrive as (S, nb, C): token index outermost, so the rows of
    the flattened (S*nb, C) working set group by token position and a
    whole token-slice K_s2/V_s2 is one contiguous static slice — no
    token padding, no per-window block-diagonal masking. Projections
    and the MLP stay full-width (S*nb, C) x (C, C) MXU matmuls; the
    per-window linear attention unrolls over the S source tokens:

        for s2: A(:, h) = ((Qf . K_s2-broadcast) @ seg)   # (S*nb, H)
                Z_acc += A;  out_acc += (A @ seg^T) . V_s2-broadcast

    where seg is the fixed 0/1 (C, H) head-segment matrix (exact in
    bf16). Row sums of A are the linear-attention normalizers, so Z
    comes free from the same loop.
    """
    d = c // nhead
    f32 = jnp.float32
    rows = s * nb

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    x3 = x_ref[...]                       # (S, nb, C) bf16
    src3 = src_ref[...]
    dt = x3.dtype
    x = x3.reshape(rows, c)
    src = src3.reshape(rows, c)

    sr = jax.lax.broadcasted_iota(jnp.int32, (c, nhead), 0) // d
    sc = jax.lax.broadcasted_iota(jnp.int32, (c, nhead), 1)
    seg = (sr == sc).astype(dt)           # (C, H) 0/1
    segT = jnp.swapaxes(seg, 0, 1)        # (H, C)

    qf = _elu1(mm(x, wq_ref[...])).astype(dt)        # (rows, C)
    # K/V features go through VMEM scratch so the source-token loop can
    # slice them dynamically (dynamic_slice on values has no TPU
    # lowering; on refs it does)
    kf_ref[...] = _elu1(mm(src, wk_ref[...])).astype(dt)
    v_ref[...] = mm(src, wv_ref[...]).astype(dt)

    q3 = qf.reshape(s, nb, c)

    def body(s2, carry):
        z_acc, o_acc = carry
        k_s2 = kf_ref[pl.ds(s2 * nb, nb), :]         # (nb, C)
        v_s2 = v_ref[pl.ds(s2 * nb, nb), :]
        prod = (q3 * k_s2[None]).reshape(rows, c)    # Q . K_s2 per (w, s1)
        a2 = mm(prod, seg)                           # (rows, H) f32
        aexp = jax.lax.dot_general(
            a2.astype(dt), segT, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt)   # (rows, C)
        o_acc = o_acc + (aexp.reshape(s, nb, c)
                         * v_s2[None]).reshape(rows, c)
        return z_acc + a2, o_acc

    z_acc, o_acc = jax.lax.fori_loop(
        0, s, body,
        (jnp.zeros((rows, nhead), f32), jnp.zeros((rows, c), f32)))

    z = 1.0 / (z_acc + 1e-6)                         # (rows, H) f32
    zc = mm(z.astype(dt), segT)                      # (rows, C)
    msg = (o_acc * zc).astype(dt)

    ln1 = ln1_ref[...]
    m = _ln(mm(msg, wm_ref[...]), ln1[0:1, :], ln1[1:2, :]).astype(dt)
    y = mm(x, w0x_ref[...]) + mm(m, w0m_ref[...])
    y = jnp.maximum(y, 0.0).astype(dt)
    ln2 = ln2_ref[...]
    y = _ln(mm(y, w1_ref[...]), ln2[0:1, :], ln2[1:2, :])
    out = (x.astype(f32) + y).astype(dt)
    out_ref[...] = out.reshape(s, nb, c)


def fused_window_layer(x: jnp.ndarray, source: jnp.ndarray,
                       params: dict, nhead: int) -> jnp.ndarray:
    """One LoFTR encoder layer over many tiny windows, fused.

    NOT DISPATCHED by LoFTREncoderLayer: measured on v5e at the fine
    shapes (B'=16384, S=25, C=128) this s-major design runs the fine
    stage at 38 ms vs 27 ms for the unfused XLA tiny-window path, and
    an earlier w-major block-diagonal design hit 37 ms — the per-window
    contractions are too small to beat XLA's fused broadcast-reduce.
    Kept (with its numerics validated against the reference) as the
    starting point for a future attempt.

    Args:
        x, source: (B', S, C) with S <= 32 (the 5x5 fine windows give
            S=25, B' = batch * max_matches).
    Returns:
        (B', S, C) in x.dtype.

    The kernel runs token-major: inputs are transposed to (S, B', C)
    outside the kernel (XLA cancels the adjacent out/in transposes
    between consecutive layers of the fine stack).
    """
    Bp, S, C = x.shape
    on_cpu = jax.devices()[0].platform == "cpu"
    nb = 256
    if (on_cpu or S > 32 or source.shape[1] != S or Bp % nb
            or C % 128 or C % nhead):
        return fused_loftr_layer_reference(x, source, params, nhead)

    dt = x.dtype
    cast = {k2: v.astype(dt) for k2, v in params.items()
            if k2 not in ("ln1", "ln2")}
    ln1 = params["ln1"].astype(jnp.float32)
    ln2 = params["ln2"].astype(jnp.float32)

    x_t = jnp.swapaxes(x, 0, 1)           # (S, B', C)
    src_t = jnp.swapaxes(source, 0, 1)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_window_kernel, nhead=nhead, nb=nb, s=S, c=C),
        out_shape=jax.ShapeDtypeStruct((S, Bp, C), dt),
        grid=(Bp // nb,),
        in_specs=[
            pl.BlockSpec((S, nb, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, nb, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            full((C, C)), full((C, C)), full((C, C)), full((C, C)),
            full((2, C)),
            full((C, 2 * C)), full((C, 2 * C)), full((2 * C, C)),
            full((2, C)),
        ],
        out_specs=pl.BlockSpec((S, nb, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S * nb, C), dt),   # kf
            pltpu.VMEM((S * nb, C), dt),   # v
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(x_t, src_t, cast["wq"], cast["wk"], cast["wv"], cast["wm"], ln1,
      cast["w0x"], cast["w0m"], cast["w1"], ln2)
    return jnp.swapaxes(out_t, 0, 1)


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
    if x.shape[1] <= 32:
        return fused_window_layer(x, source, params, nhead)
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
