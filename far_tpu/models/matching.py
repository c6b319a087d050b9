"""Coarse dual-softmax matching with static top-k selection.

Equivalent of crockwell/far: mp3d_loftr/src/loftr/utils/coarse_matching.py
re-designed for XLA: confidence thresholding + border suppression +
mutual-nearest-neighbor checks produce per-row candidate matches, and a
fixed-size top-k over rows replaces the dynamic torch.where match list
(the central static-shape re-design, SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from far_tpu.types import MatchResult
from far_tpu.utils.config import MatchConfig


def dual_softmax_confidence(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    temperature: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """conf = softmax_rows(sim) * softmax_cols(sim), sim = <f0, f1>/sqrt(C)/T.

    Returns (B, L, S) float32 confidences.
    """
    C = feat0.shape[-1]
    f0 = (feat0 / C ** 0.5).astype(jnp.float32)
    f1 = (feat1 / C ** 0.5).astype(jnp.float32)
    sim = jnp.einsum("nlc,nsc->nls", f0, f1) / temperature
    if mask0 is not None and mask1 is not None:
        m = mask0[..., None] & mask1[:, None]
        sim = jnp.where(m, sim, -1e9)
    conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
    return conf


def log_sinkhorn(
    scores: jnp.ndarray, bin_score: jnp.ndarray, iters: int
) -> jnp.ndarray:
    """Differentiable optimal transport with a dustbin row/column.

    Log-domain Sinkhorn as in SuperGlue; the reference exposes it as the
    LoFTR match_type='sinkhorn' option (coarse_matching.py:120-142).

    Args:
        scores: (B, L, S) similarity matrix.
        bin_score: scalar learnable dustbin score.
    Returns:
        (B, L+1, S+1) log assignment matrix.
    """
    B, L, S = scores.shape
    b = jnp.broadcast_to(bin_score, (B, 1, 1)).astype(scores.dtype)
    couplings = jnp.concatenate([
        jnp.concatenate([scores, jnp.tile(b, (1, L, 1))], axis=2),
        jnp.concatenate([jnp.tile(b, (1, 1, S)), b], axis=2),
    ], axis=1)  # (B, L+1, S+1)

    norm = -jnp.log(jnp.asarray(L + S, scores.dtype))
    log_mu = jnp.concatenate(
        [jnp.full((L,), norm), jnp.asarray([jnp.log(jnp.asarray(S, jnp.float32)) + norm])])
    log_nu = jnp.concatenate(
        [jnp.full((S,), norm), jnp.asarray([jnp.log(jnp.asarray(L, jnp.float32)) + norm])])
    log_mu = jnp.broadcast_to(log_mu, (B, L + 1))
    log_nu = jnp.broadcast_to(log_nu, (B, S + 1))

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v

    u, v = jax.lax.fori_loop(
        0, iters, body,
        (jnp.zeros((B, L + 1)), jnp.zeros((B, S + 1))),
    )
    return couplings + u[:, :, None] + v[:, None, :] - norm


def sinkhorn_confidence(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    bin_score: jnp.ndarray,
    iters: int = 3,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sinkhorn-based confidence matrix (the LoFTR-OT matching variant).

    Returns (B, L, S) confidences (the dustbin row/col dropped, like the
    reference's conf_matrix = assign_matrix[:, :-1, :-1]).
    """
    C = feat0.shape[-1]
    f0 = (feat0 / C ** 0.5).astype(jnp.float32)
    f1 = (feat1 / C ** 0.5).astype(jnp.float32)
    sim = jnp.einsum("nlc,nsc->nls", f0, f1)
    if mask0 is not None and mask1 is not None:
        sim = jnp.where(mask0[..., None] & mask1[:, None], sim, -1e9)
    log_assign = log_sinkhorn(sim, bin_score, iters)
    return jnp.exp(log_assign)[:, :-1, :-1]


def border_mask(h: int, w: int, b: int, dtype=bool) -> jnp.ndarray:
    """(h*w,) mask that is False within b cells of the image border."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    return ok.reshape(-1).astype(dtype)


def select_topk_matches(
    conf: jnp.ndarray,
    hw0: Tuple[int, int],
    hw1: Tuple[int, int],
    cfg: MatchConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-K mutual-NN match selection from a confidence matrix.

    Returns (i_ids, j_ids, mconf, valid), all (B, K).
    """
    B, L, S = conf.shape
    h0, w0 = hw0
    h1, w1 = hw1

    bm0 = border_mask(h0, w0, cfg.border_rm)  # (L,)
    bm1 = border_mask(h1, w1, cfg.border_rm)  # (S,)

    row_max = jnp.max(conf, axis=2, keepdims=True)  # (B, L, 1)
    col_max = jnp.max(conf, axis=1, keepdims=True)  # (B, 1, S)
    mutual = (conf == row_max) & (conf == col_max)
    ok = mutual & (conf > cfg.thr) & bm0[None, :, None] & bm1[None, None, :]

    score = jnp.where(ok, conf, 0.0)
    # at most one True per row after mutual-NN -> row reduce
    j_ids = jnp.argmax(score, axis=2).astype(jnp.int32)       # (B, L)
    row_score = jnp.max(score, axis=2)                         # (B, L)

    k = min(cfg.max_matches, L)
    mconf, i_ids = jax.lax.top_k(row_score, k)                 # (B, K)
    j_sel = jnp.take_along_axis(j_ids, i_ids, axis=1)
    valid = mconf > 0.0
    return i_ids.astype(jnp.int32), j_sel, mconf, valid


def ids_to_coords(ids: jnp.ndarray, w: int, scale: float,
                  rescale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Grid index -> pixel coordinates <x, y> at original resolution."""
    x = (ids % w).astype(jnp.float32) * scale
    y = (ids // w).astype(jnp.float32) * scale
    pts = jnp.stack([x, y], axis=-1)
    if rescale is not None:  # per-pair resize factor (B, 2)
        pts = pts * rescale[:, None, :]
    return pts


def select_topk_matches_streamed(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    hw0: Tuple[int, int],
    hw1: Tuple[int, int],
    cfg: MatchConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-K match selection without materializing the conf matrix.

    Uses the fused Pallas reduction kernel (far_tpu.ops.matching_kernel)
    to get per-row best (value, argmax) and per-column max of the
    dual-softmax confidences; mutual-NN reduces to
    row_val[i] == col_max[row_idx[i]] on the kernel's own values.
    """
    from far_tpu.ops.matching_kernel import dual_softmax_rowcol

    B, L, C = feat0.shape
    h0, w0 = hw0
    h1, w1 = hw1
    scale = jnp.float32(1.0 / C ** 0.5)
    f0 = feat0.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
    f1 = feat1.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
    row_val, row_idx, col_max = dual_softmax_rowcol(
        f0, f1, 1.0 / cfg.dsmax_temperature
    )

    bm0 = border_mask(h0, w0, cfg.border_rm)
    bm1 = border_mask(h1, w1, cfg.border_rm)
    cm_at = jnp.take_along_axis(col_max, row_idx, axis=1)
    bm1_at = jnp.take_along_axis(
        jnp.tile(bm1[None], (B, 1)), row_idx, axis=1
    )
    ok = (
        (row_val >= cm_at)
        & (row_val > cfg.thr)
        & bm0[None, :]
        & bm1_at
    )
    score = jnp.where(ok, row_val, 0.0)
    k = min(cfg.max_matches, L)
    mconf, i_ids = jax.lax.top_k(score, k)
    j_sel = jnp.take_along_axis(row_idx, i_ids, axis=1)
    valid = mconf > 0.0
    return i_ids.astype(jnp.int32), j_sel, mconf, valid


def coarse_match(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    hw0: Tuple[int, int],
    hw1: Tuple[int, int],
    coarse_scale: float,
    cfg: MatchConfig,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    scale0: Optional[jnp.ndarray] = None,
    scale1: Optional[jnp.ndarray] = None,
    return_conf: bool = False,
):
    """Full coarse matching stage.

    Args:
        feat0/feat1: (B, L, C)/(B, S, C) transformed coarse features.
        hw0/hw1: coarse grid shapes.
        coarse_scale: image-to-coarse stride (8 for ResNetFPN_8_2).
    Returns:
        (i_ids, j_ids, mconf, valid, mkpts0, mkpts1[, conf])
    """
    if return_conf or mask0 is not None:
        # dense path: the (B, L, S) matrix is needed (training loss /
        # padded-mask handling)
        conf = dual_softmax_confidence(
            feat0, feat1, cfg.dsmax_temperature, mask0, mask1
        )
        i_ids, j_ids, mconf, valid = select_topk_matches(conf, hw0, hw1, cfg)
    else:
        conf = None
        i_ids, j_ids, mconf, valid = select_topk_matches_streamed(
            feat0, feat1, hw0, hw1, cfg
        )
    mkpts0 = ids_to_coords(i_ids, hw0[1], coarse_scale, scale0)
    mkpts1 = ids_to_coords(j_ids, hw1[1], coarse_scale, scale1)
    mkpts0 = mkpts0 * valid[..., None]
    mkpts1 = mkpts1 * valid[..., None]
    if return_conf:
        return i_ids, j_ids, mconf, valid, mkpts0, mkpts1, conf
    return i_ids, j_ids, mconf, valid, mkpts0, mkpts1
