"""Fused fine-window LoFTR transformer (Pallas TPU).

One kernel runs the ENTIRE fine transformer (the reference's
loftr_fine: mp3d_loftr/src/loftr/loftr_module/transformer.py:90-112
applied to 5x5 windows, fine_preprocess.py:29-59) over the flat
(B*K*WW, C) token stream: every self/cross layer application for both
directions executes back-to-back in VMEM, so HBM traffic is f0+f1 in
and f0'+f1' out — the unfused XLA stack re-reads the ~105 MB token
tensors ~10x per layer application and materializes a 537 MB per-window
KV tensor (measured 8 ms/layer, 4 applications = the bulk of the 47 ms
fine stage).

Attention design (v5e): windows are 25 tokens, heads are d=16 — both
far below MXU tile size, so neither a per-window nor a per-head matmul
utilizes the systolic array. Instead, per 8-window sub-block (Na=200
rows, lcm(8,25)):

    A = q  @  K_big^T,  K_big (H*Na, C) = H head-masked copies of k

contracts over the FULL C=128 lanes (full MXU utilization); the head
masking of K_big makes column h*Na+j equal phi(q_h(i)) . phi(k_h(j)),
i.e. all per-head quadratic-form attention matrices side by side. A
window mask (i//s == j//s) zeroes cross-window pairs, and the
normalizer rides two tiny matmuls (per-window k-sum via a 0/1 (Na,Na)
window matrix, per-head lane sums via the 0/1 (C,C) head block-diag),
exactly the linear-attention math of models/attention.py:25-85:

    out_i = phi(q_i) (sum_j phi(k_j) v_j^T) / (phi(q_i) . sum_j phi(k_j))

restricted per window. Gradients: pallas_call has no autodiff rule, so
the custom VJP differentiates the jnp reference (fine_transformer_reference),
which the kernel matches to bf16 tolerance.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from far_tpu.ops.loftr_layer import fused_loftr_layer_reference

# Windows per A-matmul sub-block. Na = _WA * s must be a multiple of 8
# (f32 sublane tile) — for s=25 this gives Na=200, the smallest legal
# sub-block, and attention FLOPs scale linearly with Na.
_WA = int(os.environ.get("FAR_TPU_FINE_WA", "8"))
# Windows per grid step (per-step rows = _WG * s). 64 windows = 1600
# rows keeps every transient (A: 200x1600 f32 = 1.28 MB, tokens:
# 1600x128) comfortably inside the ~16 MB VMEM with double buffering.
_WG = int(os.environ.get("FAR_TPU_FINE_WG", "64"))
# timing-bisect ablations (WRONG NUMERICS, bench_fine_kernel.py only):
# 'nomask' skips the window mask, 'nokbig' skips the head-masked
# K/V expansion, 'noattn' replaces attention with a copy.
_ABLATE = os.environ.get("FAR_TPU_FINE_ABLATE", "")


def _elu1(x):
    """elu(x) + 1 without expm1 (unsupported in Pallas TPU lowering)."""
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _ln(x, scale, bias, eps=1e-5):  # torch LayerNorm default eps
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _layer_body(x, src, p, *, nhead, s, masks):
    """One LoFTREncoderLayer on VMEM-resident (N, C) token values.

    Same math as transformer.LoFTREncoderLayer with linear attention
    restricted to s-token windows (rows i, j attend iff i//s == j//s).
    """
    f32 = jnp.float32
    dt = x.dtype
    N, C = x.shape
    Na = _WA * s
    hmask, wmask, wsum, headdiag = masks

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    # elu/exp on bf16 (the VPU transcendental is the kernel's hottest
    # elementwise op; the unfused XLA path also applied elu to the bf16
    # projection output, so precision is unchanged). v5e Mosaic has no
    # bf16 compare, so the x>0 predicate reads the f32 matmul output.
    def elu1_cast(x32):
        xc = x32.astype(dt)
        return jnp.where(x32 > 0, xc + jnp.asarray(1.0, dt), jnp.exp(xc))

    q = elu1_cast(mm(x, p["wq"]))                        # (N, C)
    k = elu1_cast(mm(src, p["wk"]))
    v = (mm(src, p["wv"]) * (1.0 / s)).astype(dt)

    if _ABLATE == "noattn":
        msg = (v.astype(f32) * float(s)).astype(dt)
    else:
        msgs = []
        for b in range(N // Na):
            qb = q[b * Na:(b + 1) * Na]
            kb = k[b * Na:(b + 1) * Na]
            vb = v[b * Na:(b + 1) * Na]
            if _ABLATE == "nokbig":
                kbig = jnp.concatenate([kb] * nhead, axis=0)
                vbig = jnp.concatenate([vb] * nhead, axis=0)
            else:
                kbig = jnp.concatenate([kb] * nhead, axis=0) * hmask
                vbig = jnp.concatenate([vb] * nhead, axis=0) * hmask
            # A[i, h*Na+j] = phi(q_h(i)) . phi(k_h(j)), within-window
            # only. Mosaic insists on a 32-bit matmul accumulator; the
            # mask multiply and bf16 cast fuse into one VPU pass (the
            # old XLA path's per-window KV was a bf16 tensor too, so
            # the msg matmul at bf16 loses no precision vs round 4).
            A = jax.lax.dot_general(
                qb, kbig, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                  # (Na, H*Na)
            if _ABLATE != "nomask":
                A = A * wmask
            A = A.astype(dt)
            # normalizer: zc[i, c in head h] = 1/(phi(q_h(i)).ksum_w(i),h)
            ksumw = mm(wsum, kb).astype(dt)                  # (Na, C)
            u = qb * ksumw
            zc = 1.0 / (mm(u, headdiag) + 1e-6)              # (Na, C) f32
            msgb = jax.lax.dot_general(
                A, vbig, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                  # (Na, C)
            msgs.append((msgb * zc * float(s)).astype(dt))
        msg = jnp.concatenate(msgs, axis=0)                  # (N, C)

    m = _ln(mm(msg, p["wm"]), p["ln1"][0:1, :], p["ln1"][1:2, :]).astype(dt)
    y = mm(x, p["w0x"]) + mm(m, p["w0m"])                    # (N, 2C) f32
    y = jnp.maximum(y, 0.0).astype(dt)
    y = _ln(mm(y, p["w1"]), p["ln2"][0:1, :], p["ln2"][1:2, :])
    return (x.astype(f32) + y).astype(dt)


def _kernel(*refs, nhead: int, s: int, n_layers: int,
            layer_names: Tuple[str, ...], c: int):
    f0_ref, f1_ref = refs[0], refs[1]
    out0_ref, out1_ref = refs[-2], refs[-1]
    d = c // nhead
    Na = _WA * s
    f32 = jnp.float32

    params = []
    for li in range(n_layers):
        w = refs[2 + li * 9: 2 + (li + 1) * 9]
        params.append({"wq": w[0][...], "wk": w[1][...], "wv": w[2][...],
                       "wm": w[3][...], "ln1": w[4][...].astype(f32),
                       "w0x": w[5][...], "w0m": w[6][...], "w1": w[7][...],
                       "ln2": w[8][...].astype(f32)})

    f0 = f0_ref[...]
    f1 = f1_ref[...]
    dt = f0.dtype

    # constant masks, built once and shared across layer applications
    rh = jax.lax.broadcasted_iota(jnp.int32, (nhead * Na, c), 0) // Na
    ch = jax.lax.broadcasted_iota(jnp.int32, (nhead * Na, c), 1) // d
    hmask = (rh == ch).astype(dt)                      # (H*Na, C)
    ri = jax.lax.broadcasted_iota(jnp.int32, (Na, nhead * Na), 0) // s
    ci = (jax.lax.broadcasted_iota(jnp.int32, (Na, nhead * Na), 1) % Na) // s
    wmask = (ri == ci).astype(f32)                     # (Na, H*Na)
    wi = jax.lax.broadcasted_iota(jnp.int32, (Na, Na), 0) // s
    wj = jax.lax.broadcasted_iota(jnp.int32, (Na, Na), 1) // s
    wsum = (wi == wj).astype(dt)                       # (Na, Na) window sum
    hr = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // d
    hc2 = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // d
    headdiag = (hr == hc2).astype(dt)                  # (C, C)
    masks = (hmask, wmask, wsum, headdiag)

    body = functools.partial(_layer_body, nhead=nhead, s=s, masks=masks)
    for name, p in zip(layer_names, params):
        if name == "self":
            f0 = body(f0, f0, p)
            f1 = body(f1, f1, p)
        else:  # cross: f1 consumes the already-updated f0 (reference
            # transformer.py:100-106 sequential semantics)
            f0 = body(f0, f1, p)
            f1 = body(f1, f0, p)
    out0_ref[...] = f0
    out1_ref[...] = f1


def fine_transformer_reference(
    f0: jnp.ndarray, f1: jnp.ndarray,
    params: Sequence[Dict[str, jnp.ndarray]],
    layer_names: Sequence[str], nhead: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp reference of the same math on (n, s, C) windows."""
    for name, p in zip(layer_names, params):
        if name == "self":
            f0 = fused_loftr_layer_reference(f0, f0, p, nhead)
            f1 = fused_loftr_layer_reference(f1, f1, p, nhead)
        else:
            f0 = fused_loftr_layer_reference(f0, f1, p, nhead)
            f1 = fused_loftr_layer_reference(f1, f0, p, nhead)
    return f0, f1


def _fused(f0, f1, params, layer_names, nhead):
    n, s, C = f0.shape
    dt = f0.dtype
    wg = _WG if dt == jnp.bfloat16 else _WG // 2
    n_pad = -(-n // wg) * wg
    if n_pad != n:  # zero windows are self-contained garbage (window
        # mask keeps them out of real windows) and cropped below
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        f0 = jnp.pad(f0, pad)
        f1 = jnp.pad(f1, pad)
    rows = wg * s
    grid = (n_pad // wg,)

    flat0 = f0.reshape(n_pad * s, C)
    flat1 = f1.reshape(n_pad * s, C)

    weights = []
    w_specs = []
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    for p in params:
        for k2 in ("wq", "wk", "wv", "wm"):
            weights.append(p[k2].astype(dt))
            w_specs.append(full((C, C)))
        weights.append(p["ln1"].astype(jnp.float32))
        w_specs.append(full((2, C)))
        for k2 in ("w0x", "w0m"):
            weights.append(p[k2].astype(dt))
            w_specs.append(full((C, 2 * C)))
        weights.append(p["w1"].astype(dt))
        w_specs.append(full((2 * C, C)))
        weights.append(p["ln2"].astype(jnp.float32))
        w_specs.append(full((2, C)))
    # kernel reads params as 9 consecutive refs per layer; reorder to
    # (wq wk wv wm ln1 w0x w0m w1 ln2) — matches _kernel unpacking
    block = pl.BlockSpec((rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    out0, out1 = pl.pallas_call(
        functools.partial(
            _kernel, nhead=nhead, s=s, n_layers=len(params),
            layer_names=tuple(layer_names), c=C),
        out_shape=(jax.ShapeDtypeStruct((n_pad * s, C), dt),
                   jax.ShapeDtypeStruct((n_pad * s, C), dt)),
        grid=grid,
        in_specs=[block, block] + w_specs,
        out_specs=(block, block),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(flat0, flat1, *weights)
    out0 = out0.reshape(n_pad, s, C)[:n]
    out1 = out1.reshape(n_pad, s, C)[:n]
    return out0, out1


def _dispatch(f0, f1, params, layer_names, nhead):
    n, s, C = f0.shape
    disabled = os.environ.get("FAR_TPU_FUSED_FINE", "1") == "0"
    on_cpu = jax.devices()[0].platform == "cpu"
    ok = (not disabled and not on_cpu and C % 128 == 0 and C % nhead == 0
          and (_WA * s) % 8 == 0
          and all(nm in ("self", "cross") for nm in layer_names))
    if not ok:
        return fine_transformer_reference(f0, f1, params, layer_names, nhead)
    return _fused(f0, f1, params, layer_names, nhead)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fine_transformer_auto(f0, f1, params, layer_names, nhead):
    """Kernel-dispatched fine-window transformer with a reference VJP.

    Args:
        f0/f1: (n, s, C) window token streams (n windows of s tokens).
        params: sequence of per-layer dicts (wq/wk/wv/wm (C,C),
            w0x/w0m (C,2C), w1 (2C,C), ln1/ln2 (2,C) [scale; bias]).
        layer_names: ('self'|'cross', ...) applied in order to both
            directions (cross is sequential: f1 sees updated f0).
        nhead: attention head count.
    """
    return _dispatch(f0, f1, params, layer_names, nhead)


def _auto_fwd(f0, f1, params, layer_names, nhead):
    # Under differentiation run the REFERENCE forward and keep its vjp
    # closure (jax.vjp returns tree_util.Partial pytrees, so it is a
    # legal residual). Training then pays exactly one reference
    # fwd+bwd with XLA-chosen residuals — the same cost as the
    # pre-fusion stack. The first version saved only (f0, f1, params)
    # and re-ran the reference forward inside the backward on top of
    # the kernel forward; that double forward cost ~20% train
    # throughput (17.7 -> 14.2 pairs/s, r5 A/B).
    out, vjp = jax.vjp(
        lambda a, b, p: fine_transformer_reference(
            a, b, p, layer_names, nhead), f0, f1, params)
    return out, vjp


def _auto_bwd(layer_names, nhead, vjp, g):
    return vjp(g)


fine_transformer_auto.defvjp(_auto_fwd, _auto_bwd)
