"""Pallas fine-window gather: VMEM-resident fine map, per-match slices.

The fine stage needs K (=max_matches) 5x5xC windows of the fine feature
map at match locations (reference F.unfold + index:
mp3d_loftr/src/loftr/loftr_module/fine_preprocess.py:29-59).  The XLA
formulations move the work through HBM gathers — either 25 per-offset
row gathers or an all-windows materialization.  Here the padded fine
map for one batch element (~5 MB bf16 at 480x640/2) is DMA'd into VMEM
once and each window is a unit-stride dynamic slice of it, so HBM
traffic collapses to one read of the map + one write of the windows.

Window centers sit on the coarse grid: window element (dy, dx) of
coarse cell (y, x) is padded-fine pixel (stride*y + dy, stride*x + dx),
and zero padding reproduces the reference's out-of-bounds zeros.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, f_ref, out_ref, *, kb_size, wc, stride, window):
    b = pl.program_id(0)
    kb = pl.program_id(1)

    def body(i, _):
        idx = ids_ref[b, kb * kb_size + i]
        y = (idx // wc) * stride
        x = (idx % wc) * stride
        out_ref[0, i] = f_ref[0, pl.ds(y, window), pl.ds(x, window), :]
        return 0

    jax.lax.fori_loop(0, kb_size, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def gather_windows_vmem(
    feat_f: jnp.ndarray,
    ids: jnp.ndarray,
    coarse_hw: Tuple[int, int],
    stride: int,
    window: int,
    block_k: int = 128,
    interpret: bool = None,
) -> jnp.ndarray:
    """Gather WxW fine windows at coarse-grid match ids.

    Args:
        feat_f: (B, Hf, Wf, C) fine features.
        ids: (B, K) coarse-grid indices; K must be a multiple of
            min(K, block_k).
    Returns:
        (B, K, W*W, C), identical to models.fine.gather_windows.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, Hf, Wf, C = feat_f.shape
    hc, wc = coarse_hw
    K = ids.shape[1]
    r = window // 2
    fpad = jnp.pad(feat_f, ((0, 0), (r, r), (r, r), (0, 0)))
    Hp, Wp = Hf + 2 * r, Wf + 2 * r
    kb = min(K, block_k)
    assert K % kb == 0, (K, kb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K // kb),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda b, j, ids_ref: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, kb, window, window, C),
            lambda b, j, ids_ref: (b, j, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, kb_size=kb, wc=wc, stride=stride,
                          window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, window, window, C),
                                       feat_f.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32), fpad)
    return out.reshape(B, K, window * window, C)


def _gwv_fwd(feat_f, ids, coarse_hw, stride, window, block_k, interpret):
    out = gather_windows_vmem(feat_f, ids, coarse_hw, stride, window,
                              block_k, interpret)
    return out, (ids, feat_f.shape)


def _gwv_bwd(coarse_hw, stride, window, block_k, interpret, res, g):
    """Scatter-add window grads back onto the fine map (overlapping
    windows accumulate).  XLA's scatter-add is the exact transpose the
    sparse gather path gets from autodiff."""
    ids, (B, Hf, Wf, C) = res
    hc, wc = coarse_hw
    r = window // 2
    WW = window * window
    K = ids.shape[1]
    dy = jnp.repeat(jnp.arange(window), window)
    dx = jnp.tile(jnp.arange(window), window)
    # padded-map coords of every window element
    y = (ids // wc * stride)[..., None] + dy[None, None]   # (B, K, WW)
    x = (ids % wc * stride)[..., None] + dx[None, None]
    Hp, Wp = Hf + 2 * r, Wf + 2 * r
    flat = (y * Wp + x).reshape(B, K * WW)
    dpad = jnp.zeros((B, Hp * Wp, C), g.dtype)
    dpad = dpad.at[jnp.arange(B)[:, None], flat].add(
        g.reshape(B, K * WW, C))
    dpad = dpad.reshape(B, Hp, Wp, C)
    return (dpad[:, r:r + Hf, r:r + Wf, :], None)


gather_windows_vmem.defvjp(_gwv_fwd, _gwv_bwd)
