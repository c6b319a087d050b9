"""Fine-level refinement: window gather, fine transformer, soft-argmax.

Equivalent of crockwell/far:
mp3d_loftr/src/loftr/loftr_module/fine_preprocess.py and
src/loftr/utils/fine_matching.py, re-designed for static shapes: instead
of unfolding every 5x5 window of the fine map and indexing a dynamic
match list, we gather exactly K windows at the selected match locations
(K = MAX_MATCHES, masked). This is also cheaper: the reference's unfold
materializes L*W*W*C activations, we touch only K*W*W*C.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from far_tpu.models.transformer import LocalFeatureTransformer
from far_tpu.utils.config import FineConfig


def gather_windows_pointwise(
    feat_f: jnp.ndarray,
    ids: jnp.ndarray,
    coarse_hw: Tuple[int, int],
    stride: int,
    window: int,
) -> jnp.ndarray:
    """Reference implementation: per-element clamped gather + zero mask."""
    B, Hf, Wf, C = feat_f.shape
    hc, wc = coarse_hw
    r = window // 2

    yc = (ids // wc) * stride  # (B, K) fine-res centers
    xc = (ids % wc) * stride
    dy = jnp.arange(-r, r + 1)
    dx = jnp.arange(-r, r + 1)
    oy = jnp.repeat(dy, window)  # (WW,)
    ox = jnp.tile(dx, window)

    y = yc[..., None] + oy[None, None]  # (B, K, WW)
    x = xc[..., None] + ox[None, None]
    inb = (y >= 0) & (y < Hf) & (x >= 0) & (x < Wf)
    yi = jnp.clip(y, 0, Hf - 1)
    xi = jnp.clip(x, 0, Wf - 1)
    flat = feat_f.reshape(B, Hf * Wf, C)
    idx = (yi * Wf + xi).reshape(B, -1)  # (B, K*WW)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    out = out.reshape(B, ids.shape[1], window * window, C)
    return out * inb[..., None]


def gather_windows(
    feat_f: jnp.ndarray,
    ids: jnp.ndarray,
    coarse_hw: Tuple[int, int],
    stride: int,
    window: int,
) -> jnp.ndarray:
    """Gather WxW windows of the fine map centered at coarse cells.

    The reference's F.unfold(kernel=W, stride=stride, padding=W//2)
    window l is centered at fine pixel (stride*y_l, stride*x_l) with zero
    padding (fine_preprocess.py:41-47). Here each selected window is one
    (W, W, C) multi-dim slice-gather off the zero-padded fine map.

    Args:
        feat_f: (B, Hf, Wf, C) fine features.
        ids: (B, K) coarse grid indices.
    Returns:
        (B, K, W*W, C)
    """
    B, Hf, Wf, C = feat_f.shape
    hc, wc = coarse_hw
    r = window // 2
    WW = window * window
    K = ids.shape[1]

    # One (W, W, C) multi-dim slice per window straight off the padded
    # map, via lax.gather with real slice_sizes: K fetches per direction
    # with NO table/relayout build. All prior schemes lost to this
    # on-chip (B=16, K=1024, 480x640 fine map, both directions):
    # per-(window,dy) wide-row take_along_axis 17.9 ms, group-major
    # transposed contiguous slices 19.8 ms, per-element pointwise
    # 12.2 ms, this 6.8 ms — the TPU gather engine handles strided
    # multi-dim slices natively, and every row-widening trick paid more
    # in table-build HBM traffic than it saved in fetch issue.
    fpad = jnp.pad(feat_f, ((0, 0), (r, r), (r, r), (0, 0)))
    Hp, Wp = Hf + 2 * r, Wf + 2 * r
    # slice [y0:y0+W, x0:x0+W] must fit even for the bottom/right cells
    ph = max(0, stride * (hc - 1) + window - Hp)
    pw = max(0, stride * (wc - 1) + window - Wp)
    if ph or pw:
        fpad = jnp.pad(fpad, ((0, 0), (0, ph), (0, pw), (0, 0)))
    y0 = (ids // wc) * stride  # (B, K) window-origin fine coords
    x0 = (ids % wc) * stride
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    out = jax.vmap(lambda t, yy, xx: jax.lax.gather(
        t, jnp.stack([yy, xx], -1), dnums,
        slice_sizes=(window, window, C), mode="clip",
    ))(fpad, y0, x0)  # (B, K, W, W, C)
    return out.reshape(B, K, WW, C)


class _SplitMerge(nn.Module):
    """nn.Dense over a [windows || broadcast coarse] concat, computed as
    a split matmul so the (B, K, WW, 2C) concat (and the WW-fold
    broadcast of the coarse row) never materializes in HBM:

        merge([f, c]) = f @ W[:C] + (c @ W[C:] + b) per window center.

    Same parameter tree (kernel/bias at the same path, same init) and
    the same math as the concat form, up to dot accumulation order."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        Cin = f.shape[-1] + c.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (Cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kf = kernel[:f.shape[-1]].astype(self.dtype)
        kc = kernel[f.shape[-1]:].astype(self.dtype)
        ctx = c.astype(self.dtype) @ kc + bias.astype(self.dtype)
        return f.astype(self.dtype) @ kf + ctx[..., None, :]


class FinePreprocess(nn.Module):
    """Window gather + optional coarse-context injection.

    Equivalent of crockwell/far: fine_preprocess.py:29-59.
    """

    cfg: FineConfig
    d_model_c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat_f0: jnp.ndarray,   # (B, Hf, Wf, Cf)
        feat_f1: jnp.ndarray,
        feat_c0: jnp.ndarray,   # (B, L, Cc) transformed coarse features
        feat_c1: jnp.ndarray,
        i_ids: jnp.ndarray,     # (B, K)
        j_ids: jnp.ndarray,
        coarse_hw: Tuple[int, int],
        stride: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        W = self.cfg.window_size
        f0 = gather_windows(feat_f0, i_ids, coarse_hw, stride, W)
        f1 = gather_windows(feat_f1, j_ids, coarse_hw, stride, W)

        if self.cfg.concat_coarse_feat:
            down = nn.Dense(self.cfg.d_model, dtype=self.dtype, name="down_proj")
            c0 = jnp.take_along_axis(feat_c0, i_ids[..., None], axis=1)  # (B,K,Cc)
            c1 = jnp.take_along_axis(feat_c1, j_ids[..., None], axis=1)
            c0 = down(c0)  # (B, K, Cf)
            c1 = down(c1)
            if self.cfg.split_merge:
                merge = _SplitMerge(self.cfg.d_model, dtype=self.dtype,
                                    name="merge_feat")
                f0 = merge(f0, c0)
                f1 = merge(f1, c1)
            else:
                merge = nn.Dense(self.cfg.d_model, dtype=self.dtype,
                                 name="merge_feat")
                c0b = c0[..., None, :]
                c1b = c1[..., None, :]
                f0 = merge(jnp.concatenate(
                    [f0, jnp.broadcast_to(
                        c0b, f0.shape[:-1] + (self.cfg.d_model,))], -1))
                f1 = merge(jnp.concatenate(
                    [f1, jnp.broadcast_to(
                        c1b, f1.shape[:-1] + (self.cfg.d_model,))], -1))
        return f0, f1


def fine_softargmax(
    f0t: jnp.ndarray,  # (B, K, WW, C) transformed windows
    f1t: jnp.ndarray,
    window: int,
) -> jnp.ndarray:
    """Center-vs-window soft-argmax: expectation + std over the heatmap.

    Equivalent of crockwell/far: fine_matching.py:15-76. Standalone (no
    parameters) so the bench can time it separately from the fine
    transformer."""
    B, K, WW, C = f0t.shape
    center = f0t[:, :, WW // 2, :]  # (B, K, C)
    sim = jnp.einsum("bkc,bkrc->bkr", center, f1t) / C ** 0.5
    heatmap = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)  # (B, K, WW)

    # normalized grid in [-1, 1]
    ax = jnp.linspace(-1.0, 1.0, window)
    gy = jnp.repeat(ax, window)
    gx = jnp.tile(ax, window)
    grid = jnp.stack([gx, gy], axis=-1)  # (WW, 2), <x, y>

    coords = jnp.einsum("bkr,rd->bkd", heatmap, grid)  # (B, K, 2)
    var = jnp.einsum("bkr,rd->bkd", heatmap, grid ** 2) - coords ** 2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10)), axis=-1)  # (B, K)
    return jnp.concatenate([coords, std[..., None]], axis=-1)  # (B, K, 3)


class FineMatching(nn.Module):
    """Fine transformer + center-vs-window soft-argmax refinement.

    Equivalent of crockwell/far: fine_matching.py:15-76 (expectation +
    std over the correlation heatmap; sub-pixel update of mkpts1).
    """

    cfg: FineConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def transform(
        self,
        f0: jnp.ndarray,  # (B, K, WW, C) windows from FinePreprocess
        f1: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fine transformer only (the parameterized part)."""
        B, K, WW, C = f0.shape
        ft = LocalFeatureTransformer(
            d_model=self.cfg.d_model,
            nhead=self.cfg.nhead,
            layer_names=tuple(self.cfg.layer_names),
            attention=self.cfg.attention,
            dtype=self.dtype,
            window_tokens=WW,  # windows are independent: dispatches the
            # whole stack to the fused Pallas window kernel on TPU
            # (eval only; training runs the AD-transparent layer loop)
            name="loftr_fine",
        )
        f0t, f1t = ft(f0.reshape(B * K, WW, C), f1.reshape(B * K, WW, C),
                      train=train)
        return f0t.reshape(B, K, WW, C), f1t.reshape(B, K, WW, C)

    def __call__(
        self,
        f0: jnp.ndarray,  # (B, K, WW, C) windows from FinePreprocess
        f1: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        f0t, f1t = self.transform(f0, f1, train=train)
        return fine_softargmax(f0t, f1t, self.cfg.window_size)


def fine_coords_to_kpts(
    expec_f: jnp.ndarray,
    mkpts1_c: jnp.ndarray,
    window: int,
    fine_scale: float,
    scale1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """mkpts1_f = mkpts1_c + coords * (W//2) * fine_scale [* scale1]."""
    delta = expec_f[..., :2] * (window // 2) * fine_scale
    if scale1 is not None:
        delta = delta * scale1[:, None, :]
    return mkpts1_c + delta
