"""Robust estimation layer (reference L1): batched on-device RANSAC.

The reference hops GPU->CPU->GPU through OpenCV for every pose estimate
(crockwell/far: mp3d_loftr/src/utils/metrics.py:80-174). Here the whole
solve — biased sampling, minimal solves, verification, prior scoring,
pose recovery — is one jitted XLA program with static shapes.
"""

from far_tpu.solvers.types import PoseEstimate, PriorParams
from far_tpu.solvers.ransac import RansacConfig, prior_ransac
from far_tpu.solvers.pose_estimation import estimate_pose, SolverConfig
