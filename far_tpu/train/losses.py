"""FAR training losses.

Equivalent of crockwell/far: mp3d_loftr/src/losses/loftr_loss.py
(LoFTRLoss): focal/CE coarse loss (dense or sparse supervision), fine
l2(/std) loss, RT loss on the normalized 9D pose, and the clamped scale
loss. All reductions are mask-aware so the static-shape padding never
contributes.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp

from far_tpu.models.constants import compute_normalized_6d
from far_tpu.utils.config import LossConfig


@flax.struct.dataclass
class FarLosses:
    total: jnp.ndarray
    coarse: jnp.ndarray
    fine: jnp.ndarray
    rt_rot: jnp.ndarray
    rt_tr: jnp.ndarray
    scale: jnp.ndarray

    def scalars(self):
        return {
            "loss": self.total,
            "loss_c": self.coarse,
            "loss_f": self.fine,
            "loss_rot": self.rt_rot,
            "loss_tr": self.rt_tr,
            "loss_scale": self.scale,
        }


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / (jnp.sum(m) + eps)


def coarse_loss(
    conf: jnp.ndarray,
    conf_gt: jnp.ndarray,
    cfg: LossConfig,
    sparse_spvs: bool = True,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal (or CE) loss on the dual-softmax confidence matrix.

    sparse_spvs follows the reference default for dual-softmax: only
    positive GT cells are supervised (loftr_loss.py:91-118); the dense
    variant adds the negative term.
    """
    conf = jnp.clip(conf.astype(jnp.float32), 1e-6, 1 - 1e-6)
    pos = conf_gt == 1
    neg = conf_gt == 0
    w = jnp.ones_like(conf) if weight is None else weight

    if cfg.coarse_type == "cross_entropy":
        loss_pos = -jnp.log(conf)
        loss_neg = -jnp.log(1 - conf)
        lp = _masked_mean(loss_pos * w, pos)
        ln = _masked_mean(loss_neg * w, neg)
        return cfg.pos_weight * lp + cfg.neg_weight * ln

    a, g = cfg.focal_alpha, cfg.focal_gamma
    loss_pos = -a * (1 - conf) ** g * jnp.log(conf)
    if sparse_spvs:
        return cfg.pos_weight * _masked_mean(loss_pos * w, pos)
    loss_neg = -a * conf ** g * jnp.log(1 - conf)
    return cfg.pos_weight * _masked_mean(loss_pos * w, pos) + \
        cfg.neg_weight * _masked_mean(loss_neg * w, neg)


def fine_loss(
    expec_f: jnp.ndarray,
    expec_f_gt: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """l2 (optionally inverse-std weighted) loss on fine offsets.

    Only slots whose GT offset lies inside the window (inf-norm <
    fine_correct_thr) and that hold a real match contribute
    (loftr_loss.py:158-187).
    """
    correct = (
        jnp.max(jnp.abs(expec_f_gt), axis=-1) < cfg.fine_correct_thr
    ) & valid
    off = jnp.sum((expec_f_gt - expec_f[..., :2]) ** 2, axis=-1)
    if cfg.fine_type == "l2":
        return _masked_mean(off, correct)
    std = expec_f[..., 2]
    inv_std = 1.0 / jnp.clip(std, 1e-10)
    # normalize weights over the *valid* population, detached
    denom = _masked_mean(inv_std, valid)
    w = jnp.where(valid, inv_std / (denom + 1e-8), 0.0)
    w = jax_stop_gradient(w)
    return _masked_mean(off * w, correct)


def jax_stop_gradient(x):
    import jax

    return jax.lax.stop_gradient(x)


def rt_loss(
    pose_9d: jnp.ndarray,
    T_0to1: jnp.ndarray,
    cfg: LossConfig,
):
    """L1/L2 on the normalized 9D pose vs GT (loftr_loss.py:247-277).

    pose_9d is already normalized (regressor output).
    """
    gt = compute_normalized_6d(T_0to1[..., :3, :4])
    p = 1 if cfg.use_l1_rt_loss else 2
    diff = jnp.abs(pose_9d - gt) ** p
    loss_tr = jnp.clip(jnp.mean(diff[..., :3]), 1e-8, 1e5)
    loss_rot = jnp.clip(jnp.mean(diff[..., 3:]), 1e-8, 1e5)
    return loss_tr, loss_rot


def scale_loss(translation_scale: jnp.ndarray, T_0to1: jnp.ndarray,
               cfg: LossConfig) -> jnp.ndarray:
    """Clamped squared loss on the metric translation norm
    (loftr_loss.py:279-291): above max_scale_loss the gradient is cut."""
    gt = jnp.linalg.norm(T_0to1[..., :3, 3], axis=-1)
    loss = jnp.mean((translation_scale - gt) ** 2)
    return jnp.where(loss > cfg.max_scale_loss, 0.0, loss)


def compute_losses(
    cfg: LossConfig,
    conf: Optional[jnp.ndarray] = None,
    conf_gt: Optional[jnp.ndarray] = None,
    expec_f: Optional[jnp.ndarray] = None,
    expec_f_gt: Optional[jnp.ndarray] = None,
    fine_valid: Optional[jnp.ndarray] = None,
    pose_9d: Optional[jnp.ndarray] = None,
    T_0to1: Optional[jnp.ndarray] = None,
    translation_scale: Optional[jnp.ndarray] = None,
    sparse_spvs: bool = True,
) -> FarLosses:
    zero = jnp.asarray(0.0, jnp.float32)
    l_c = l_f = l_rot = l_tr = l_s = zero
    if conf is not None and conf_gt is not None:
        l_c = coarse_loss(conf, conf_gt, cfg, sparse_spvs)
    if expec_f is not None and expec_f_gt is not None:
        l_f = fine_loss(expec_f, expec_f_gt, fine_valid, cfg)
    if pose_9d is not None and T_0to1 is not None and \
            (cfg.rt_weight_rot + cfg.rt_weight_tr) > 0:
        l_tr, l_rot = rt_loss(pose_9d, T_0to1, cfg)
    if translation_scale is not None and T_0to1 is not None:
        l_s = scale_loss(translation_scale, T_0to1, cfg)
    total = (
        l_c * cfg.coarse_weight
        + l_f * cfg.fine_weight
        + l_rot * cfg.rt_weight_rot
        + l_tr * cfg.rt_weight_tr
        + l_s * cfg.scale_weight
    )
    return FarLosses(total=total, coarse=l_c, fine=l_f,
                     rt_rot=l_rot, rt_tr=l_tr, scale=l_s)
