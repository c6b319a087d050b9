"""End-to-end FAR inference: images -> fused 6DoF pose, one XLA program.

This is the TPU-native version of the reference demo/test path
(crockwell/far: mp3d_loftr/src/lightning/lightning_loftr.py:325-343
test_step): matcher -> solver -> regressor -> prior-biased solver ->
regressor. The reference crosses the GPU/CPU boundary at every solver
call (SURVEY.md §3.1); here the whole loop jits into a single program
and batches over pairs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from far_tpu.models.constants import denormalize_9d
from far_tpu.models.loftr import FARLoFTR
from far_tpu.solvers.pose_estimation import SolverConfig, estimate_pose
from far_tpu.types import FarOutput, MatcherOutput, PairBatch, SolverSummary
from far_tpu.utils.config import FARConfig


def make_solver_configs(cfg: FARConfig) -> Tuple[SolverConfig, SolverConfig]:
    """(first-round, refinement-round) solver configs.

    With solver='prior_ransac' the reference's first round runs a plain
    RANSAC (no prior exists yet; metrics.py:100 requires priorRT), and
    later rounds run the prior-biased engine.
    """
    so = cfg.solver
    base = dict(
        num_hypotheses=so.num_hypotheses,
        minimal_solver=so.minimal_solver,
        pixel_thr=so.pixel_thr,
        prior_inl_th=so.prior_inl_th,
        prior_lambda=so.prior_lambda,
        bias_sigma_sq=so.bias_sigma_sq,
        scoring=so.scoring,
    )
    if so.solver == "prior_ransac":
        first = SolverConfig(solver="prior_ransac_noprior", **base)
        refine = SolverConfig(solver="prior_ransac", **{
            **base, "num_hypotheses": so.refine_num_hypotheses})
    elif so.solver == "prior_ransac_noprior":
        first = refine = SolverConfig(solver="prior_ransac_noprior", **base)
    else:
        first = refine = SolverConfig(solver="ransac", **base)
    return first, refine


def _summarize(est, num_before) -> SolverSummary:
    return SolverSummary(
        rt=est.rt34,
        num_before=num_before,
        num_after=est.num_inliers,
        num_tight=est.num_tight,
        num_ultra_tight=est.num_ultra_tight,
        success=est.success,
    )


def far_forward(
    model: FARLoFTR,
    variables: Dict[str, Any],
    batch: PairBatch,
    key: jax.Array,
    train: bool = False,
) -> FarOutput:
    """Full FAR inference for a batch of pairs (call under jit).

    Rounds = config.solver.fine_pred_steps (reference FINE_PRED_STEPS=2):
    round 0 solves without a prior; each later round re-solves with the
    previous fused pose as a prior and re-regresses.
    """
    cfg = model.config
    first_cfg, refine_cfg = make_solver_configs(cfg)

    out: MatcherOutput = model.apply(
        variables, batch, train=train, method=FARLoFTR.match,
        mutable=False,
    )
    m = out.matches
    num_before = jnp.sum(m.valid.astype(jnp.float32), axis=-1)

    # EMM features are solver-independent -> computed once for all rounds
    features = model.apply(
        variables, out.feat_c0, out.feat_c1,
        method=FARLoFTR.regress_features, mutable=False,
    )

    k0, k1 = jax.random.split(key)
    est = estimate_pose(
        k0, m.mkpts0_f, m.mkpts1_f, batch.K0, batch.K1, m.valid,
        translation_scale=out.translation_scale, cfg=first_cfg,
    )
    summary = _summarize(est, num_before)
    pose_9d, gate, _ = model.apply(
        variables, features, summary,
        method=FARLoFTR.regress_fuse, mutable=False,
    )
    prior_rt = denormalize_9d(pose_9d)

    keys = jax.random.split(k1, max(cfg.solver.fine_pred_steps - 1, 0))
    for i in range(cfg.solver.fine_pred_steps - 1):
        est = estimate_pose(
            keys[i], m.mkpts0_f, m.mkpts1_f, batch.K0, batch.K1, m.valid,
            prior_rt=prior_rt,
            translation_scale=out.translation_scale, cfg=refine_cfg,
        )
        summary = _summarize(est, num_before)
        pose_9d, gate, _ = model.apply(
            variables, features, summary,
            method=FARLoFTR.regress_fuse, mutable=False,
        )
        prior_rt = denormalize_9d(pose_9d)

    final_rt = denormalize_9d(pose_9d)
    return FarOutput(
        R=final_rt[..., :3, :3],
        t=final_rt[..., :3, 3],
        solver_rt=est.rt34,
        regressed_9d=pose_9d,
        prior_rt=prior_rt,
        matches=m,
        num_inliers=est.num_inliers,
        success=est.success,
        gating=gate,
        translation_scale=out.translation_scale,
    )


def mapfree_forward(
    matcher: FARLoFTR,
    matcher_vars: Dict[str, Any],
    reg_model,
    reg_vars: Dict[str, Any],
    batch: PairBatch,
    image0_reg: jnp.ndarray,
    image1_reg: jnp.ndarray,
    key: jax.Array,
    pixel_thr: float = 2.0,
    fine_pred_steps: int = 2,
):
    """Map-free FAR inference: matcher -> solver -> 6DReg -> prior loop.

    Equivalent of crockwell/far:
    mapfree_6dreg/lib/models/regression/model.py:235-308 (forward):
    round 0 solves with plain RANSAC (reference: cv2 USAC_MAGSAC,
    pose_solver.py:81-83), later rounds with the prior-biased engine;
    the regression network fuses via its MoE gate each round.

    Args:
        batch: matcher-resolution grayscale pair (image0/image1 + K).
        image0_reg/image1_reg: regressor-resolution RGB pair (B, H, W, 3).
    Returns:
        (R (B,3,3), t (B,3), gate, est) of the final round.
    """
    m_out = matcher.apply(
        matcher_vars, batch, train=False, method=FARLoFTR.match,
        mutable=False,
    )
    m = m_out.matches

    # round 0 mirrors the reference's cv2.USAC_MAGSAC: sigma-marginalized
    # scoring instead of a hard inlier count (pose_solver.py:81-83)
    first_cfg = SolverConfig(solver="ransac", pixel_thr=pixel_thr,
                             scoring="magsac")
    refine_cfg = SolverConfig(solver="prior_ransac")

    keys = jax.random.split(key, fine_pred_steps)
    prior_rt = None
    R = t = gate = est = None
    for i in range(fine_pred_steps):
        cfg_i = first_cfg if i == 0 else refine_cfg
        est = estimate_pose(
            keys[i], m.mkpts0_f, m.mkpts1_f, batch.K0, batch.K1, m.valid,
            prior_rt=prior_rt, cfg=cfg_i,
        )
        inlier_counts = jnp.stack(
            [est.num_inliers, est.num_tight, est.num_ultra_tight], -1)
        R, t, pose_9d, gate = reg_model.apply(
            reg_vars, image0_reg, image1_reg, est.rt34, inlier_counts,
            mutable=False,
        )
        prior_rt = jnp.concatenate([R, t[..., None]], -1)
    return R, t, gate, est


def vitess_forward(
    vitess_model,
    vitess_vars: Dict[str, Any],
    images: jnp.ndarray,                 # (B, 2, H, W, 3) RGB in [0, 1]
    matcher: Optional[FARLoFTR] = None,
    matcher_vars: Optional[Dict[str, Any]] = None,
    matcher_batch: Optional[PairBatch] = None,
    key: Optional[jax.Array] = None,
):
    """8pt-ViT inference, optionally FAR-gated by a solver pose.

    Equivalent of the reference eval path
    (interiornetStreetlearn_8ptVit/test_streetlearn_interiornet.py:91-150):
    the reference gates with *cached* LoFTR predictions; here the matcher
    + on-device solver produce them inline when provided.

    Returns (tran (B, 3), R (B, 3, 3), pose_9d, gate).
    """
    solver_pose = None
    num_corr = None
    if matcher is not None:
        m_out = matcher.apply(
            matcher_vars, matcher_batch, train=False,
            method=FARLoFTR.match, mutable=False,
        )
        m = m_out.matches
        est = estimate_pose(
            key, m.mkpts0_f, m.mkpts1_f, matcher_batch.K0, matcher_batch.K1,
            m.valid, cfg=SolverConfig(solver="prior_ransac_noprior"),
        )
        solver_pose = est.rt34
        num_corr = est.num_inliers
    return vitess_model.apply(
        vitess_vars, images, solver_pose, num_corr, mutable=False)


def build_inference_fn(model: FARLoFTR):
    """Returns a jitted (variables, batch, key) -> FarOutput."""

    @jax.jit
    def fn(variables, batch: PairBatch, key):
        return far_forward(model, variables, batch, key, train=False)

    return fn


def init_model(
    cfg: Optional[FARConfig] = None,
    seed: int = 0,
    batch_size: int = 1,
) -> Tuple[FARLoFTR, Dict[str, Any]]:
    """Construct the model and initialize all parameters."""
    cfg = cfg or FARConfig()
    model = FARLoFTR(cfg)
    H, W = cfg.image_size
    batch = PairBatch(
        image0=jnp.zeros((batch_size, H, W, 1), jnp.float32),
        image1=jnp.zeros((batch_size, H, W, 1), jnp.float32),
        K0=jnp.tile(jnp.eye(3)[None], (batch_size, 1, 1)),
        K1=jnp.tile(jnp.eye(3)[None], (batch_size, 1, 1)),
    )
    # jit the init: eager linen init dispatches thousands of tiny ops,
    # which is very slow on remote TPU backends (one RPC per op).
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(jax.random.PRNGKey(seed), batch)
    return model, variables
