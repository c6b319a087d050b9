"""Fused dual-softmax matching reductions (Pallas TPU).

Computes, per image pair, the quantities coarse matching actually needs
from the (L, S) dual-softmax confidence matrix

    conf = softmax_rows(S/T) * softmax_cols(S/T),   S = f0 @ f1^T / sqrt(C)

namely: per-row best confidence + argmax (row_val, row_idx) and the
per-column max confidence (col_max) used for the mutual-NN check —
without ever materializing conf in HBM (1.5 GB at B=16, N=4800; the
materialized jnp path costs ~130 ms/batch, this kernel streams it).

Used by far_tpu.models.matching.select_topk_matches on TPU; the
threshold/border/mutual logic and the static top-k stay in XLA where
they are cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(f0_ref, f1t_ref, rowval_ref, rowidx_ref, colmax_ref,
            *, block: int, l: int, s: int, inv_temp: float):
    """f0 (1, L, C), f1t (1, C, S) pre-transposed.

    Row outputs are (1, L, 1) — sublane-major so the per-block dynamic
    stores land on the (8, 128)-tileable sublane axis. colmax is
    (1, 8, S) with the data in sublane 0 (full-width static store).
    """
    nb = l // block
    f1t = f1t_ref[0, :, :]

    def s_block(i):
        f0b = f0_ref[0, pl.ds(i * block, block), :]
        return jax.lax.dot_general(
            f0b, f1t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_temp  # (block, S) f32

    # pass 1: streaming column softmax stats
    def p1(i, carry):
        cmax, csum = carry
        sb = s_block(i)
        bmax = jnp.max(sb, axis=0, keepdims=True)
        cmax_new = jnp.maximum(cmax, bmax)
        csum_new = csum * jnp.exp(cmax - cmax_new) + jnp.sum(
            jnp.exp(sb - cmax_new), axis=0, keepdims=True
        )
        return cmax_new, csum_new

    cmax, csum = jax.lax.fori_loop(
        0, nb, p1,
        (jnp.full((1, s), _NEG_INF, jnp.float32),
         jnp.zeros((1, s), jnp.float32)),
    )
    cinv = 1.0 / csum

    # pass 2: conf blockwise; row best val/idx; streaming col max of conf
    def p2(i, colmax):
        sb = s_block(i)
        rmax = jnp.max(sb, axis=1, keepdims=True)
        e = jnp.exp(sb - rmax)
        rsum = jnp.sum(e, axis=1, keepdims=True)
        conf = (e / rsum) * (jnp.exp(sb - cmax) * cinv)  # (block, S)

        rv = jnp.max(conf, axis=1, keepdims=True)        # (block, 1)
        ri = jnp.argmax(conf, axis=1).astype(jnp.int32)[:, None]
        rowval_ref[0, pl.ds(i * block, block), :] = rv
        rowidx_ref[0, pl.ds(i * block, block), :] = ri
        return jnp.maximum(colmax, jnp.max(conf, axis=0, keepdims=True))

    colmax = jax.lax.fori_loop(
        0, nb, p2, jnp.zeros((1, s), jnp.float32)
    )
    colmax_ref[0, 0, :] = colmax[0, :]


def _pick_block(n: int) -> int:
    for b in (512, 480, 400, 320, 256, 240, 160, 128, 96, 64, 32, 16, 8):
        if n % b == 0 and b % 8 == 0:
            return b
    return 0


def dual_softmax_rowcol_reference(f0, f1, inv_temp):
    """jnp fallback: materializes conf (fine for small L*S / CPU)."""
    sim = jnp.einsum(
        "blc,bsc->bls", f0.astype(jnp.float32), f1.astype(jnp.float32)
    ) * inv_temp
    conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
    row_val = jnp.max(conf, axis=2)
    row_idx = jnp.argmax(conf, axis=2).astype(jnp.int32)
    col_max = jnp.max(conf, axis=1)
    return row_val, row_idx, col_max


def dual_softmax_rowcol(
    f0: jnp.ndarray, f1: jnp.ndarray, inv_temp: float
):
    """Row-best (value, argmax) and column-max of the dual-softmax
    confidence matrix, streamed on TPU.

    Args:
        f0: (B, L, C) already scaled by 1/sqrt(C); f1: (B, S, C).
        inv_temp: 1 / dsmax_temperature.
    Returns:
        row_val (B, L) f32, row_idx (B, L) int32, col_max (B, S) f32.
    """
    B, L, C = f0.shape
    S = f1.shape[1]
    block = _pick_block(L)
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu or block == 0 or L < 1024 or S != L:
        return dual_softmax_rowcol_reference(f0, f1, inv_temp)

    f1t = jnp.swapaxes(f1, -1, -2)  # (B, C, S)
    row_val, row_idx, col_max = pl.pallas_call(
        functools.partial(_kernel, block=block, l=L, s=S, inv_temp=inv_temp),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, S), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(f0, f1t)
    return row_val[:, :, 0], row_idx[:, :, 0], col_max[:, 0, :]
