"""Pose estimation front-end: pixel keypoints -> robust (R, t).

TPU equivalent of crockwell/far: mp3d_loftr/src/utils/metrics.py:80-174
(estimate_pose): normalize keypoints by intrinsics, dispatch to the
on-device RANSAC (with or without a pose prior), recover the pose, and
optionally apply a predicted metric translation scale.

Unlike the reference there is no solver-failure python branch: failures
(too few valid matches) surface as ``success=False`` with an identity
pose, matching the reference's fallback semantics (metrics.py:253-256)
but under static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from far_tpu.geometry.transforms import normalize_kpts_by_K
from far_tpu.solvers.ransac import RansacConfig, prior_ransac
from far_tpu.solvers.types import PoseEstimate, PriorParams

# Probe point cloud size for the prior transport error; the reference
# draws 300 uniform [-3, 3] points per call (metrics.py:103).
_NUM_PCL = 300


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver configuration.

    solver: 'ransac' (uniform sampling, pixel threshold, no prior),
            'prior_ransac_noprior' (fixed 3e-7 threshold, no prior —
            reference flag parity),
            'prior_ransac' (biased sampling + prior scoring).
    pixel_thr: RANSAC threshold in pixels (reference RANSAC_PIXEL_THR=0.5);
            divided by the mean focal length and squared to become a
            squared-sampson threshold on normalized coords.
    """

    solver: str = "ransac"
    num_hypotheses: int = 2048
    pixel_thr: float = 0.5
    prior_inl_th: float = 3e-7  # reference uses a fixed 3e-7 for prior paths
    prior_lambda: float = 0.3
    bias_sigma_sq: float = 0.1
    min_valid: int = 8
    minimal_solver: str = "8pt"  # '8pt' or '5pt' (Nister)
    scoring: str = "inlier"      # or 'magsac' (sigma-marginalized)

    def ransac_config(self, use_prior: bool) -> RansacConfig:
        return RansacConfig(
            num_hypotheses=self.num_hypotheses,
            minimal_solver=self.minimal_solver,
            inl_th=self.prior_inl_th,
            prior_lambda=self.prior_lambda,
            bias_sigma_sq=self.bias_sigma_sq,
            use_prior_scoring=use_prior,
            use_biased_sampling=use_prior,
            min_valid=self.min_valid,
            scoring=self.scoring,
        )


def default_prior_pcl(dtype=jnp.float32) -> jnp.ndarray:
    """Fixed probe cloud (the reference reseeds numpy to 0 per pair, so
    its cloud is deterministic too — metrics.py:243 + 103)."""
    key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (_NUM_PCL, 3), dtype, minval=-3.0, maxval=3.0)


def estimate_pose(
    key: jax.Array,
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    valid: jnp.ndarray,
    prior_rt: Optional[jnp.ndarray] = None,
    translation_scale: Optional[jnp.ndarray] = None,
    cfg: SolverConfig = SolverConfig(),
) -> PoseEstimate:
    """Robust essential-matrix pose estimation, batched over pairs.

    Args:
        kpts0/kpts1: (B, N, 2) pixel correspondences (padded to N).
        K0/K1: (B, 3, 3) intrinsics.
        valid: (B, N) bool mask over the padding.
        prior_rt: (B, 3, 4) pose prior (used when cfg.solver='prior_ransac').
        translation_scale: (B,) optional metric scale multiplier for t.
    Returns:
        PoseEstimate (see types.py).
    """
    kp0n = normalize_kpts_by_K(kpts0, K0)
    kp1n = normalize_kpts_by_K(kpts1, K1)

    use_prior = prior_rt is not None and cfg.solver == "prior_ransac"
    rcfg = cfg.ransac_config(use_prior)

    prior = None
    inl_th = None
    if use_prior:
        prior = PriorParams(rt=prior_rt, pcl=default_prior_pcl(kp0n.dtype))
    if cfg.solver == "ransac":
        # pixel threshold -> normalized squared threshold per pair
        f = jnp.stack(
            [K0[..., 0, 0], K1[..., 1, 1], K0[..., 0, 0], K1[..., 1, 1]], -1
        ).mean(-1)
        inl_th = (cfg.pixel_thr / f) ** 2  # (B,)

    est = prior_ransac(key, kp0n, kp1n, valid, prior, rcfg, inl_th=inl_th)
    if translation_scale is None:
        return est
    return est.replace(t=est.t * translation_scale[..., None])
