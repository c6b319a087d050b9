"""Dataset-level pose normalization constants.

The FAR losses/regressors operate on a normalized 9D pose
(translation + ortho-6D rotation). The normalization statistics are
dataset-level constants computed on the Matterport val split by the
reference (crockwell/far: mp3d_loftr/src/losses/loftr_loss.py:7-8).
"""

import numpy as np
import jax.numpy as jnp

# order: (t_x, t_y, t_z, r_00, r_01, r_02, r_10, r_11, r_12)
#
# NOTE: kept as numpy (host) constants on purpose. Captured *device*
# arrays become hidden per-call arguments of every jitted function that
# closes over them, which costs a host round-trip per call on remote TPU
# backends; numpy constants fold into the executable as literals.
POSE_MEAN_6D = np.asarray(
    [-0.34898765, 0.17085525, -0.87944315,
     0.50275223, 0.03533648, -0.18179045,
     -0.03533648, 0.98189617, 0.09313615],
    np.float32,
)
POSE_STD_6D = np.asarray(
    [1.94014405, 0.36770130, 1.88317520,
     0.51837117, 0.12717603, 0.65426397,
     0.12717603, 0.0188729, 0.09709263],
    np.float32,
)

# 8pt-ViT per-dataset constants (crockwell/far:
# interiornetStreetlearn_8ptVit/train.py:148-164) are defined alongside
# the ViTEss model.


def compute_normalized_6d(pose34: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) pose -> normalized 9D (t, first two rotation rows)."""
    from far_tpu.geometry.rotations import matrix_to_rotation_6d

    six = matrix_to_rotation_6d(pose34[..., :3, :3])
    tr = pose34[..., :3, 3]
    raw = jnp.concatenate([tr, six], axis=-1)
    return (raw - POSE_MEAN_6D) / POSE_STD_6D


def denormalize_9d(pose9d: jnp.ndarray) -> jnp.ndarray:
    """Normalized 9D -> (..., 3, 4) pose matrix."""
    from far_tpu.geometry.rotations import rotation_6d_to_matrix

    raw = pose9d * POSE_STD_6D + POSE_MEAN_6D
    t = raw[..., :3]
    R = rotation_6d_to_matrix(raw[..., 3:])
    return jnp.concatenate([R, t[..., None]], axis=-1)
