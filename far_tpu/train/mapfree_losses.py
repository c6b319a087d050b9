"""Map-free rotation/translation loss registry.

Equivalent of crockwell/far: mapfree_6dreg/lib/utils/loss.py (the
name-dispatched registry the RegressionModel resolves via eval():
frobenius/l1/angular/6D/quaternion/bin rotation losses and
l1/l2/angular/scale-direction translation losses), plus the Kendall &
Cipolla learnable loss weighting the reference supports when LAMBDA=0.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from far_tpu.geometry.rotations import (
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
    matrix_to_quaternion,
    geodesic_distance,
)

ROT_LOSSES: Dict[str, Callable] = {}
TRANS_LOSSES: Dict[str, Callable] = {}


def _rot(fn):
    ROT_LOSSES[fn.__name__] = fn
    return fn


def _trans(fn):
    TRANS_LOSSES[fn.__name__] = fn
    return fn


# ---------------- rotation ------------------------------------------------

@_rot
def rot_frobenius_loss(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """||R_pred - R_gt||_F^2 mean."""
    return jnp.mean(jnp.sum((R_pred - R_gt) ** 2, axis=(-2, -1)))


@_rot
def rot_l1_loss(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(R_pred - R_gt))


@_rot
def rot_angle_loss(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians)."""
    return jnp.mean(geodesic_distance(R_pred, R_gt))


@_rot
def rot_6d_loss(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """L2 between the 6D representations (the FAR map-free config)."""
    return jnp.mean(jnp.sum(
        (matrix_to_rotation_6d(R_pred) - matrix_to_rotation_6d(R_gt)) ** 2,
        -1))


@_rot
def rot_quat_loss(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """min over sign of quaternion L1."""
    q_p = matrix_to_quaternion(R_pred)
    q_g = matrix_to_quaternion(R_gt)
    d1 = jnp.sum(jnp.abs(q_p - q_g), -1)
    d2 = jnp.sum(jnp.abs(q_p + q_g), -1)
    return jnp.mean(jnp.minimum(d1, d2))


@_rot
def rot_bin_loss(R_bins_logits: jnp.ndarray, euler_gt_deg: jnp.ndarray
                 ) -> jnp.ndarray:
    """Cross-entropy over 360/180/360 Euler-angle bins
    (AngularBins head)."""
    lx = R_bins_logits[..., :360]
    ly = R_bins_logits[..., 360:540]
    lz = R_bins_logits[..., 540:900]
    tx = jnp.clip(jnp.round(euler_gt_deg[..., 0]) + 180, 0, 359).astype(int)
    ty = jnp.clip(jnp.round(euler_gt_deg[..., 1]) + 90, 0, 179).astype(int)
    tz = jnp.clip(jnp.round(euler_gt_deg[..., 2]) + 180, 0, 359).astype(int)

    def ce(logits, t):
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), t[..., None], -1)[..., 0]

    return jnp.mean(ce(lx, tx) + ce(ly, ty) + ce(lz, tz))


# ---------------- translation --------------------------------------------

@_trans
def trans_l1_loss(t_pred: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(t_pred - t_gt))


@_trans
def trans_l2_loss(t_pred: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.sum((t_pred - t_gt) ** 2, -1))


@_trans
def trans_unnormalized_loss(t_pred, t_gt) -> jnp.ndarray:
    """L2 norm of the metric residual (the FAR map-free config)."""
    return jnp.mean(jnp.linalg.norm(t_pred - t_gt, axis=-1))


@_trans
def trans_ang_loss(t_pred, t_gt, eps: float = 1e-8) -> jnp.ndarray:
    """Angular error between translation directions."""
    cos = jnp.sum(t_pred * t_gt, -1) / (
        jnp.linalg.norm(t_pred, axis=-1) * jnp.linalg.norm(t_gt, axis=-1)
        + eps)
    return jnp.mean(jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7)))


@_trans
def trans_scale_direction_loss(t_pred, t_gt) -> jnp.ndarray:
    """Direction angle + |scale| residual decomposition."""
    ang = trans_ang_loss(t_pred, t_gt)
    scale = jnp.mean(jnp.abs(
        jnp.linalg.norm(t_pred, axis=-1) - jnp.linalg.norm(t_gt, axis=-1)))
    return ang + scale


def combined_loss(
    R_pred, t_pred, R_gt, t_gt,
    rot_loss: str = "rot_6d_loss",
    trans_loss: str = "trans_unnormalized_loss",
    lam: float = 1.0,
    s_r: jnp.ndarray | None = None,
    s_t: jnp.ndarray | None = None,
):
    """R_loss + lam * t_loss (reference model.py:322 — LAMBDA scales the
    TRANSLATION term), or homoscedastic weighting when lam == 0
    (Kendall & Cipolla; reference model.py:90-94, 318-320)."""
    lr = ROT_LOSSES[rot_loss](R_pred, R_gt)
    lt = TRANS_LOSSES[trans_loss](t_pred, t_gt)
    if lam == 0.0:
        assert s_r is not None and s_t is not None
        total = lt * jnp.exp(-s_t) + s_t + lr * jnp.exp(-s_r) + s_r
    else:
        total = lr + lam * lt
    return total, {"rot_loss": lr, "trans_loss": lt}
