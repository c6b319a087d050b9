"""Fused dual-softmax bilinear attention kernel (Pallas TPU).

Computes, per (batch, head):

    S = scale * q @ k^T                      (N x N, never materialized in HBM)
    A = softmax_rows(S) * softmax_cols(S)
    F = v^T @ A @ v                          (Dv x Dv)

This is the core of FAR's EMM CrossAttention (crockwell/far:
mp3d_loftr/src/loftr/loftr_module/transformer.py:275-292), whose torch
version materializes the full (N, N) attention per head. At N=4800 and
batch 16 that matrix is ~5.9 GB in f32 — it doesn't even fit on-chip.
The kernel streams S in row blocks, flash-attention style, using

    A[n, m] = [exp(S[n,m]-rmax[n]) / rsum[n]] * [exp(S[n,m]-cmax[m]) / csum[m]]

Two passes over row blocks: pass 1 accumulates the column (max, sumexp)
stats; pass 2 recomputes S blockwise (cheaper than storing it), applies
both softmax factors, and contracts v^T A v on the MXU. Row stats are
recomputed in pass 2 rather than stored — narrow (N, 1) VMEM stores are
slower than the extra reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, kt_ref, v_ref, out_ref,
            *, block: int, n: int, scale: float):
    """Blocks: q (1, N, D), kt (1, D, N) pre-transposed, v (1, N, Dv).

    Single pass over row blocks. Rows of S live entirely inside one
    (block, N) tile, so the row softmax R = softmax_rows(S_b) is exact
    locally; the column factor is handled flash-style with a running
    column max and a rescaled accumulator

        G[u, m] = sum_n v[n, u] * R[n, m] * exp(S[n, m] - cmax[m])

    carried as a (Dv, N) f32 tile (cmax rides the lane axis, so the
    rescale is a natural (1, N) broadcast). At the end
    F = (G / csum) @ V. Versus the two-pass formulation this computes
    S once instead of twice and spends 2 exps/element instead of 3;
    both exponents are <= 0 so nothing overflows, and the rescale
    factors are <= 1 as in standard flash attention.
    """
    nb = n // block
    kt_all = kt_ref[0, :, :]
    v_all = v_ref[0, :, :]
    dv = v_ref.shape[2]

    def body(i, carry):
        G, cmax, csum = carry
        qb = q_ref[0, pl.ds(i * block, block), :]
        s = jax.lax.dot_general(
            qb, kt_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block, N) f32

        rmax = jnp.max(s, axis=1, keepdims=True)       # (block, 1)
        e = jnp.exp(s - rmax)
        rinv = 1.0 / jnp.sum(e, axis=1, keepdims=True)

        bmax = jnp.max(s, axis=0, keepdims=True)       # (1, N)
        cnew = jnp.maximum(cmax, bmax)
        fix = jnp.exp(cmax - cnew)                     # (1, N), <= 1
        E = jnp.exp(s - cnew)                          # (block, N)
        csum = csum * fix + jnp.sum(E, axis=0, keepdims=True)

        P = ((e * rinv) * E).astype(v_all.dtype)       # (block, N)
        vb = v_ref[0, pl.ds(i * block, block), :]
        G = G * fix + jax.lax.dot_general(
            vb, P, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Dv, N)
        return G, cnew, csum

    G, cmax, csum = jax.lax.fori_loop(
        0, nb, body,
        (jnp.zeros((dv, n), jnp.float32),
         jnp.full((1, n), _NEG_INF, jnp.float32),
         jnp.zeros((1, n), jnp.float32)),
    )
    H = (G * (1.0 / csum)).astype(v_all.dtype)         # (Dv, N)
    out_ref[0, :, :] = jax.lax.dot_general(
        H, v_all, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Dv, Dv)


def _pick_block(n: int) -> int:
    for b in (512, 480, 400, 320, 256, 240, 160, 128, 96, 64, 32, 16, 8):
        if n % b == 0 and b % 8 == 0:
            return b
    return 0


def bilinear_dual_softmax_reference(q, k, v, scale):
    """jnp fallback (materializes S per (b, h) — fine for small N)."""
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    A = jax.nn.softmax(s, axis=-1) * jax.nn.softmax(s, axis=-2)
    vf = v.astype(jnp.float32)
    w = jnp.einsum("bhnm,bhmv->bhnv", A, vf)
    return jnp.einsum("bhnu,bhnv->bhuv", vf, w)


def bilinear_dual_softmax_streaming(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block: int = 512,
) -> jnp.ndarray:
    """jnp twin of the Pallas kernel: lax.scan over row blocks with a
    checkpointed body, so S is never materialized and autodiff through
    it is memory-feasible at N=4800 (the full-matrix reference needs a
    ~5.9 GB (B, H, N, N) residual). Used as the backward path of
    bilinear_dual_softmax during training."""
    B, H, N, D = q.shape
    Dv = v.shape[-1]
    nb = N // block
    qf = jnp.moveaxis(q.reshape(B, H, nb, block, D), 2, 0)
    vf = jnp.moveaxis(v.reshape(B, H, nb, block, Dv), 2, 0)
    kT = jnp.swapaxes(k, -1, -2)  # (B, H, D, N)

    @jax.checkpoint
    def body(carry, xs):
        G, cmax, csum = carry
        qb, vb = xs
        s = jnp.einsum("bhld,bhdn->bhln", qb.astype(jnp.float32),
                       kT.astype(jnp.float32)) * scale
        rmax = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - rmax)
        rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        bmax = jnp.max(s, axis=-2, keepdims=True)
        cnew = jnp.maximum(cmax, bmax)
        fix = jnp.exp(cmax - cnew)
        E = jnp.exp(s - cnew)
        csum = csum * fix + jnp.sum(E, axis=-2, keepdims=True)
        P = (e * rinv) * E
        G = G * fix + jnp.einsum("bhlu,bhlm->bhum",
                                 vb.astype(jnp.float32), P)
        return (G, cnew, csum), None

    init = (jnp.zeros((B, H, Dv, N), jnp.float32),
            jnp.full((B, H, 1, N), _NEG_INF, jnp.float32),
            jnp.zeros((B, H, 1, N), jnp.float32))
    (G, cmax, csum), _ = jax.lax.scan(body, init, (qf, vf))
    Hm = G / csum
    return jnp.einsum("bhum,bhmw->bhuw", Hm, v.astype(jnp.float32))


def _dispatch(q, k, v, scale):
    B, H, N, D = q.shape
    Dv = v.shape[-1]
    block = _pick_block(N)
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu or block == 0 or N < 1024:
        return bilinear_dual_softmax_reference(q, k, v, scale)

    qf = q.reshape(B * H, N, D)
    ktf = jnp.swapaxes(k.reshape(B * H, N, D), -1, -2)  # (BH, D, N)
    vf = v.reshape(B * H, N, Dv)

    out = pl.pallas_call(
        functools.partial(_kernel, block=block, n=N, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Dv, Dv), jnp.float32),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Dv, Dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(qf, ktf, vf)
    return out.reshape(B, H, Dv, Dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bilinear_dual_softmax(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """F[b,h] = v^T (softmax_r(S) * softmax_c(S)) v with S = scale q k^T.

    Args:
        q, k: (B, H, N, D); v: (B, H, N, Dv).
    Returns:
        (B, H, Dv, Dv) float32.

    Forward runs the fused Pallas kernel (or the jnp reference on CPU /
    small N); pallas_call has no autodiff rule, so the VJP
    differentiates the streaming jnp twin instead (full-matrix
    reference at small N).
    """
    return _dispatch(q, k, v, scale)


def _bds_fwd(q, k, v, scale):
    return _dispatch(q, k, v, scale), (q, k, v)


def _bds_bwd(scale, res, g):
    q, k, v = res
    N = q.shape[2]
    block = _pick_block(N)
    if N < 1024 or block == 0:
        ref = bilinear_dual_softmax_reference
    else:
        # The streaming twin reshapes N into (N // block, block); it must
        # use the same block the dispatcher would pick for this N, not the
        # default 512 (N=4800 picks 480 — 512 would fail the reshape).
        ref = functools.partial(bilinear_dual_softmax_streaming, block=block)
    _, vjp = jax.vjp(lambda a, b, c: ref(a, b, c, scale), q, k, v)
    return vjp(g)


bilinear_dual_softmax.defvjp(_bds_fwd, _bds_bwd)
