"""Typed pytrees used across the framework.

The reference threads a single mutable ``data`` dict through every stage
(crockwell/far: mp3d_loftr/src/loftr/loftr.py docstrings). Here each
stage has an explicit, statically-shaped input/output pytree so the whole
pipeline jits end-to-end (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class PairBatch:
    """A batch of image pairs. Images are NHWC grayscale, float in [0, 1].

    depth/pose fields are optional (inference needs only images + K).
    """

    image0: jnp.ndarray                     # (B, H, W, 1)
    image1: jnp.ndarray                     # (B, H, W, 1)
    K0: jnp.ndarray                         # (B, 3, 3)
    K1: jnp.ndarray                         # (B, 3, 3)
    T_0to1: Optional[jnp.ndarray] = None    # (B, 4, 4) or (B, 3, 4)
    T_1to0: Optional[jnp.ndarray] = None
    depth0: Optional[jnp.ndarray] = None    # (B, H, W)
    depth1: Optional[jnp.ndarray] = None
    scale0: Optional[jnp.ndarray] = None    # (B, 2) resize scale <w, h>
    scale1: Optional[jnp.ndarray] = None
    pair_id: Optional[jnp.ndarray] = None   # (B,)


@flax.struct.dataclass
class MatchResult:
    """Fixed-size coarse+fine correspondence set (static MAX_MATCHES).

    The reference emits variable-length match lists via torch.where
    (coarse_matching.py:190-195); here every pair yields exactly K slots
    with a validity mask, so downstream solvers compile once.
    """

    i_ids: jnp.ndarray     # (B, K) int32 coarse grid index in image 0
    j_ids: jnp.ndarray     # (B, K) int32 coarse grid index in image 1
    mconf: jnp.ndarray     # (B, K) confidence (0 where invalid)
    valid: jnp.ndarray     # (B, K) bool
    mkpts0: jnp.ndarray    # (B, K, 2) pixel coords in image 0 (coarse)
    mkpts1: jnp.ndarray    # (B, K, 2) pixel coords in image 1 (coarse)
    mkpts0_f: jnp.ndarray  # (B, K, 2) fine (refined) pixel coords
    mkpts1_f: jnp.ndarray  # (B, K, 2)
    expec_f: jnp.ndarray   # (B, K, 3) fine <x, y, std> in window units


@flax.struct.dataclass
class MatcherOutput:
    """Everything the matcher produces that later stages consume."""

    matches: MatchResult
    feat_c0: jnp.ndarray   # (B, L, C) transformed coarse features, image 0
    feat_c1: jnp.ndarray   # (B, S, C)
    conf_matrix: Optional[jnp.ndarray] = None     # (B, L, S) for dense loss
    translation_scale: Optional[jnp.ndarray] = None  # (B,)


@flax.struct.dataclass
class SolverSummary:
    """Solver-side scalars fed to the MoE gate, normalized as in the
    reference (counts / 500 — loftr.py:158)."""

    rt: jnp.ndarray                 # (B, 3, 4) solver pose
    num_before: jnp.ndarray         # (B,) matches before RANSAC
    num_after: jnp.ndarray          # (B,) inliers after RANSAC
    num_tight: jnp.ndarray          # (B,)
    num_ultra_tight: jnp.ndarray    # (B,)
    success: jnp.ndarray            # (B,) bool


@flax.struct.dataclass
class RegressorOutput:
    pose_9d: jnp.ndarray            # (B, 9) normalized (t, 6d-rot)
    gating: Optional[jnp.ndarray]   # (B, 1|2|9) MoE weights
    features: Optional[jnp.ndarray] # (B, H) pre-MoE features (debug dumps)


@flax.struct.dataclass
class FarOutput:
    """Final output of one FAR inference step."""

    R: jnp.ndarray                  # (B, 3, 3) fused rotation
    t: jnp.ndarray                  # (B, 3) fused translation
    solver_rt: jnp.ndarray          # (B, 3, 4) last solver pose
    regressed_9d: jnp.ndarray       # (B, 9) last regressor output (normalized)
    prior_rt: jnp.ndarray           # (B, 3, 4) prior used in the last round
    matches: MatchResult
    num_inliers: jnp.ndarray        # (B,)
    success: jnp.ndarray            # (B,)
    gating: Optional[jnp.ndarray] = None
    translation_scale: Optional[jnp.ndarray] = None
