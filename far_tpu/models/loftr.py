"""FARLoFTR: the full matcher + regressor model (Flax).

Composes backbone -> position encoding -> coarse transformer -> coarse
matching -> fine refinement (the LoFTR matcher), plus the FAR EMM pose
regressor with MoE gating. Equivalent of crockwell/far:
mp3d_loftr/src/loftr/loftr.py (LoFTR) with the functional pytree
interface replacing the mutable data dict.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from far_tpu.models.backbone import ResNetFPN_8_2, ResNetFPN_16_4
from far_tpu.models.constants import compute_normalized_6d
from far_tpu.models.fine import (
    FineMatching,
    FinePreprocess,
    fine_coords_to_kpts,
)
from far_tpu.models.matching import coarse_match
from far_tpu.models.position import add_sine_position_encoding
from far_tpu.models.regressor import PoseRegressorEMM
from far_tpu.models.transformer import LocalFeatureTransformer
from far_tpu.types import MatcherOutput, MatchResult, PairBatch, SolverSummary
from far_tpu.utils.config import FARConfig


def _dtype_of(cfg: FARConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class TranslationScaleHead(nn.Module):
    """Metric translation-scale predictor from the coarse feature maps.

    Equivalent of crockwell/far: loftr.py:31-50 (shrinking conv stack +
    MLP over the concatenated pair features), with the pair features
    concatenated per-pair (the reference reshape assumed batch size 1).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_c0: jnp.ndarray, feat_c1: jnp.ndarray) -> jnp.ndarray:
        c1 = nn.Conv(128, (1, 1), dtype=self.dtype, name="c1")
        c2 = nn.Conv(64, (1, 1), dtype=self.dtype, name="c2")
        c3 = nn.Conv(16, (1, 1), dtype=self.dtype, name="c3")

        def shrink(x):
            x = nn.max_pool(x, (2, 2), (2, 2))
            x = nn.relu(c1(x))
            x = nn.max_pool(x, (2, 2), (2, 2))
            x = nn.relu(c2(x))
            x = nn.relu(c3(x))
            return x

        s0 = shrink(feat_c0)
        s1 = shrink(feat_c1)  # shared weights, like the reference stack
        B = s0.shape[0]
        flat = jnp.concatenate(
            [s0.reshape(B, -1), s1.reshape(B, -1)], axis=-1
        )
        y = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(flat))
        y = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc2")(y))
        y = nn.Dense(1, dtype=self.dtype, name="fc3")(y)
        return y[..., 0].astype(jnp.float32)


class FARLoFTR(nn.Module):
    """LoFTR matcher + FAR regressor.

    Use `.apply(..., method="match")` for the matcher stage and
    `.apply(..., method="regress")` for each prior-refinement round; the
    robust solver between the two lives in far_tpu.solvers (it has no
    parameters). `__call__` runs both once so `init` creates every
    parameter.
    """

    config: FARConfig

    def setup(self):
        cfg = self.config
        dt = _dtype_of(cfg)
        bb_cls = ResNetFPN_8_2 if cfg.backbone.resolution[0] == 8 \
            else ResNetFPN_16_4
        if cfg.remat == "selective":
            # keep conv outputs, recompute the elementwise norm/relu
            # values between them (config.remat docstring); `train` is a
            # static python bool
            bb_cls = nn.remat(
                bb_cls, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "bb_conv"))
        elif cfg.remat:  # True | 'full'
            # rematerialize the whole FPN in the backward pass
            bb_cls = nn.remat(bb_cls, static_argnums=(2,))
        self.backbone = bb_cls(
            initial_dim=cfg.backbone.initial_dim,
            block_dims=tuple(cfg.backbone.block_dims),
            norm=cfg.backbone.norm,
            dtype=dt,
        )
        self.loftr_coarse = LocalFeatureTransformer(
            d_model=cfg.coarse.d_model,
            nhead=cfg.coarse.nhead,
            layer_names=tuple(cfg.coarse.layer_names),
            attention=cfg.coarse.attention,
            dtype=dt,
        )
        if cfg.match.match_type == "sinkhorn":
            self.bin_score = self.param(
                "bin_score",
                lambda key: jnp.asarray(cfg.match.skh_init_bin_score,
                                        jnp.float32),
            )
        self.fine_preprocess = FinePreprocess(
            cfg=cfg.fine, d_model_c=cfg.coarse.d_model, dtype=dt
        )
        self.fine_matching = FineMatching(cfg=cfg.fine, dtype=dt)
        if cfg.regress_rt:
            self.regressor = PoseRegressorEMM(
                cfg=cfg.regress, grid_hw=cfg.coarse_hw, dtype=dt
            )
        if cfg.predict_translation_scale:
            self.ts_head = TranslationScaleHead(dtype=dt)

    # ------------------------------------------------------------------ #

    def match(self, batch: PairBatch, train: bool = False) -> MatcherOutput:
        """Backbone + coarse transformer + coarse/fine matching."""
        cfg = self.config
        hc, wc = cfg.coarse_hw
        coarse_stride = cfg.backbone.resolution[0]
        fine_stride_ratio = coarse_stride // cfg.backbone.resolution[1]

        # batch the two images through the backbone together (same trick
        # as the reference for better BN statistics, loftr.py:72-74)
        B = batch.image0.shape[0]
        imgs = jnp.concatenate([batch.image0, batch.image1], axis=0)
        feat_c, feat_f = self.backbone(imgs, train)  # positional: remat
                                                     # static_argnums=(2,)
        feat_c0, feat_c1 = feat_c[:B], feat_c[B:]
        feat_f0, feat_f1 = feat_f[:B], feat_f[B:]

        # translation scale (optional) uses the pre-transformer coarse maps
        translation_scale = None
        if cfg.predict_translation_scale:
            translation_scale = self.ts_head(feat_c0, feat_c1)

        # position encoding + flatten to tokens
        pe0 = add_sine_position_encoding(feat_c0, cfg.coarse.temp_bug_fix)
        pe1 = add_sine_position_encoding(feat_c1, cfg.coarse.temp_bug_fix)
        t0 = pe0.reshape(B, hc * wc, -1)
        t1 = pe1.reshape(B, hc * wc, -1)

        t0, t1 = self.loftr_coarse(t0, t1)

        if cfg.match.match_type == "sinkhorn":
            from far_tpu.models.matching import (
                ids_to_coords,
                select_topk_matches,
                sinkhorn_confidence,
            )

            conf = sinkhorn_confidence(
                t0, t1, self.bin_score, cfg.match.skh_iters)
            i_ids, j_ids, mconf, valid = select_topk_matches(
                conf, (hc, wc), (hc, wc), cfg.match)
            mkpts0 = ids_to_coords(i_ids, wc, float(coarse_stride),
                                   batch.scale0) * valid[..., None]
            mkpts1 = ids_to_coords(j_ids, wc, float(coarse_stride),
                                   batch.scale1) * valid[..., None]
            if not train:
                conf = None
        else:
            # dense conf matrix is only materialized for the training
            # loss; at inference the Pallas matching kernel streams it
            res = coarse_match(
                t0, t1, (hc, wc), (hc, wc), float(coarse_stride), cfg.match,
                scale0=batch.scale0, scale1=batch.scale1, return_conf=train,
            )
            if train:
                i_ids, j_ids, mconf, valid, mkpts0, mkpts1, conf = res
            else:
                i_ids, j_ids, mconf, valid, mkpts0, mkpts1 = res
                conf = None

        # fine refinement
        f0w, f1w = self.fine_preprocess(
            feat_f0, feat_f1, t0, t1, i_ids, j_ids, (hc, wc),
            stride=fine_stride_ratio,
        )
        expec_f = self.fine_matching(f0w, f1w, train=train)
        mkpts1_f = fine_coords_to_kpts(
            expec_f, mkpts1, cfg.fine.window_size,
            float(cfg.backbone.resolution[1]), batch.scale1,
        )
        mkpts1_f = jnp.where(valid[..., None], mkpts1_f, mkpts1)

        matches = MatchResult(
            i_ids=i_ids, j_ids=j_ids, mconf=mconf, valid=valid,
            mkpts0=mkpts0, mkpts1=mkpts1,
            mkpts0_f=mkpts0, mkpts1_f=mkpts1_f, expec_f=expec_f,
        )
        return MatcherOutput(
            matches=matches, feat_c0=t0, feat_c1=t1,
            conf_matrix=conf, translation_scale=translation_scale,
        )

    # ------------------------------------------------------------------ #

    def _solver_pose_in(self, summary: SolverSummary) -> jnp.ndarray:
        cfg = self.config
        pose9 = compute_normalized_6d(summary.rt)  # (B, 9)
        parts = [pose9]
        if cfg.regress.use_num_corres:
            parts.append(summary.num_after[..., None] / 500.0)
        if cfg.regress.use_many_ransac_thr:
            parts.append(summary.num_before[..., None] / 500.0)
            parts.append(summary.num_tight[..., None] / 500.0)
            parts.append(summary.num_ultra_tight[..., None] / 500.0)
        return jnp.concatenate(parts, axis=-1)

    def regress(
        self,
        feat_c0: jnp.ndarray,
        feat_c1: jnp.ndarray,
        summary: SolverSummary,
    ):
        """One FAR regression round: EMM + MoE fusion with the solver pose.

        Equivalent of LoFTR.forward_rt_prediction + preprocess_helper
        (reference loftr.py:137-192). The solver pose enters as a
        normalized 9D vector with the (scaled) correspondence counts.
        """
        pose_9d, gate, features = self.regressor(
            feat_c0, feat_c1, solver_pose_in=self._solver_pose_in(summary)
        )
        return pose_9d, gate, features

    def regress_features(self, feat_c0: jnp.ndarray, feat_c1: jnp.ndarray):
        """EMM feature extraction only (solver-independent).

        The refinement loop calls the regressor once per round, but the
        EMM bilinear attention depends only on the coarse features — not
        on the solver pose — so its output is identical across rounds
        (the extra per-round LoFTR layers, when enabled, also ignore the
        pose; the reference threads it into attention but the attention
        implementations discard it). Computing it once halves the
        regressor cost of the prior loop.
        """
        return self.regressor.features_only(feat_c0, feat_c1)

    def regress_fuse(self, features: jnp.ndarray, summary: SolverSummary):
        """MoE fusion of precomputed EMM features with a solver pose."""
        return self.regressor.fuse(features, self._solver_pose_in(summary))

    # ------------------------------------------------------------------ #

    def __call__(self, batch: PairBatch, train: bool = False):
        """Init-friendly single pass through every submodule."""
        out = self.match(batch, train=train)
        if not self.config.regress_rt:
            return out
        B = batch.image0.shape[0]
        dummy = SolverSummary(
            rt=jnp.tile(jnp.eye(3, 4, dtype=jnp.float32)[None], (B, 1, 1)),
            num_before=jnp.zeros((B,), jnp.float32),
            num_after=jnp.zeros((B,), jnp.float32),
            num_tight=jnp.zeros((B,), jnp.float32),
            num_ultra_tight=jnp.zeros((B,), jnp.float32),
            success=jnp.ones((B,), bool),
        )
        pose_9d, gate, _ = self.regress(out.feat_c0, out.feat_c1, dummy)
        return out, pose_9d, gate
