"""Typed pytrees for solver inputs/outputs.

Replaces the reference's mutable ``data``-dict bus with functional,
jit-safe structures (SURVEY.md §7 architecture decision).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class PoseEstimate:
    """Result of a robust two-view pose solve. All fields batched (B, ...).

    Mirrors what the reference's estimate_pose returns
    (crockwell/far: mp3d_loftr/src/utils/metrics.py:80-174): the essential
    matrix, recovered (R, t), inlier mask and the three inlier counts the
    FAR gating network consumes (loose / tight / ultra-tight).
    """

    E: jnp.ndarray            # (B, 3, 3)
    R: jnp.ndarray            # (B, 3, 3)
    t: jnp.ndarray            # (B, 3) unit norm unless rescaled
    inliers: jnp.ndarray      # (B, N) bool
    num_inliers: jnp.ndarray  # (B,) float — matches after RANSAC
    num_tight: jnp.ndarray    # (B,) float — inliers at thr/10
    num_ultra_tight: jnp.ndarray  # (B,) float — inliers at thr/100
    success: jnp.ndarray      # (B,) bool — enough valid correspondences

    @property
    def rt34(self) -> jnp.ndarray:
        """(B, 3, 4) pose matrix [R | t]."""
        return jnp.concatenate([self.R, self.t[..., None]], axis=-1)


@flax.struct.dataclass
class PriorParams:
    """Pose prior for biased sampling + hypothesis scoring.

    The TPU analogue of the prior_params dict at
    crockwell/far: mp3d_loftr/src/utils/metrics.py:104-113.
    """

    rt: jnp.ndarray   # (B, 3, 4) prior pose (t gets unit-normalized)
    pcl: jnp.ndarray  # (P, 3) probe point cloud for the transport error
