"""SPMD train steps for the ViTEss and map-free 6DReg model families.

Completes the training matrix (the FARLoFTR family lives in
far_tpu.train.trainer): TPU equivalents of
- crockwell/far: interiornetStreetlearn_8ptVit/train.py:280-351 (Adam +
  OneCycle, clip 2.5, loss = w_tr * MSE(t_norm) + w_rot * MSE(rot6d_norm)
  in the dataset-normalized space), and
- crockwell/far: mapfree_6dreg/lib/models/regression/model.py:310-333
  (matcher (frozen) -> solver -> regression net; loss =
  rot_loss + LAMBDA * trans_loss, or Kendall-Cipolla homoscedastic
  weighting when LAMBDA == 0, with learnable s_r/s_t).

Same parallelism scheme as the FAR trainer: a 1-D mesh over 'data',
replicated params, batch sharded, XLA inserts the gradient psums; BN is
sync-BN for free. The map-free solver round runs inside the step — fully
on-device, unlike the reference's per-step cv2 round trip.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from far_tpu.geometry.rotations import matrix_to_rotation_6d
from far_tpu.models.sixdreg import MapfreeRegression, SixDRegConfig
from far_tpu.models.vitess import VITESS_POSE_STATS, ViTEss, ViTEssConfig
from far_tpu.solvers.pose_estimation import SolverConfig, estimate_pose
from far_tpu.train.mapfree_losses import combined_loss
from far_tpu.train.optim import OptimConfig, build_optimizer
from far_tpu.train.trainer import TrainState


# --------------------------------------------------------------------- #
# batches + collates
# --------------------------------------------------------------------- #

@flax.struct.dataclass
class ViTEssBatch:
    images: jnp.ndarray                  # (B, 2, H, W, 3) RGB in [0, 1]
    T_0to1: jnp.ndarray                  # (B, 4, 4)
    solver_rt: Optional[jnp.ndarray] = None      # (B, 3, 4) gating input
    solver_num_corr: Optional[jnp.ndarray] = None  # (B,)


@flax.struct.dataclass
class MapfreeBatch:
    image0: jnp.ndarray                  # (B, H, W, 3) regressor-res RGB
    image1: jnp.ndarray
    corr: jnp.ndarray                    # (B, N, 2, 2) pixel matches
    corr_valid: jnp.ndarray              # (B, N) bool
    K0: jnp.ndarray                      # (B, 3, 3)
    K1: jnp.ndarray
    T_0to1: jnp.ndarray                  # (B, 4, 4)


def _rgb(sample: Dict, key: str) -> np.ndarray:
    """RGB image from a sample dict; tiles grayscale if no _rgb field."""
    if f"{key}_rgb" in sample:
        return np.asarray(sample[f"{key}_rgb"], np.float32)
    g = np.asarray(sample[key], np.float32)
    return np.tile(g, (1, 1, 3))


def collate_vitess(samples: List[Dict]) -> ViTEssBatch:
    images = np.stack([
        np.stack([_rgb(s, "image0"), _rgb(s, "image1")]) for s in samples
    ])
    kwargs = dict(
        images=images,
        T_0to1=np.stack([np.asarray(s["T_0to1"], np.float32)
                         for s in samples]),
    )
    if all("solver_rt" in s for s in samples):
        kwargs["solver_rt"] = np.stack(
            [np.asarray(s["solver_rt"], np.float32) for s in samples])
        kwargs["solver_num_corr"] = np.stack(
            [np.asarray(s.get("num_correspondences", 0.0), np.float32)
             for s in samples])
    return ViTEssBatch(**kwargs)


def collate_sixdreg(samples: List[Dict]) -> MapfreeBatch:
    return MapfreeBatch(
        image0=np.stack([_rgb(s, "image0") for s in samples]),
        image1=np.stack([_rgb(s, "image1") for s in samples]),
        corr=np.stack([np.asarray(s["correspondences"], np.float32)
                       for s in samples]),
        corr_valid=np.stack([np.asarray(s["corr_valid"], bool)
                             for s in samples]),
        K0=np.stack([np.asarray(s["K0"], np.float32) for s in samples]),
        K1=np.stack([np.asarray(s["K1"], np.float32) for s in samples]),
        T_0to1=np.stack([np.asarray(s["T_0to1"], np.float32)
                         for s in samples]),
    )


# --------------------------------------------------------------------- #
# shared SPMD plumbing
# --------------------------------------------------------------------- #

class _SpmdTrainer:
    """Mesh + jit plumbing shared by the family trainers."""

    def __init__(self, tx: optax.GradientTransformation,
                 devices: Optional[list] = None):
        self.tx = tx
        devices = devices if devices is not None else jax.devices()
        self.mesh = Mesh(np.asarray(devices), ("data",))
        self.repl = NamedSharding(self.mesh, P())
        self.data_sharding = NamedSharding(self.mesh, P("data"))
        self._step = jax.jit(
            self._train_step,
            in_shardings=(self.repl, self.data_sharding, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )

    def _make_state(self, variables: Dict[str, Any]) -> TrainState:
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
        )
        return jax.device_put(state, self.repl)

    def _apply_grads(self, state, grads, aux):
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=aux["batch_stats"], opt_state=new_opt,
        )
        metrics = {**aux["metrics"], "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    def _train_step(self, state, batch, key):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, key)
        return self._apply_grads(state, grads, aux)

    def step(self, state, batch, key):
        return self._step(state, jax.device_put(batch, self.data_sharding),
                          key)

    def eval_step(self, state, batch, key):
        """Loss metrics without a parameter update (subepoch val shard,
        reference train.py:229-235 is_training=False pass). Applies the
        model with train=False (running BN stats, no mutation), matching
        the reference's eval-mode semantics."""
        if not hasattr(self, "_eval"):
            def _eval(state, batch, key):
                _, aux = self._loss(state.params, state.batch_stats,
                                    batch, key, train=False)
                return aux["metrics"]

            self._eval = jax.jit(
                _eval,
                in_shardings=(self.repl, self.data_sharding, self.repl),
                out_shardings=self.repl,
            )
        return self._eval(state, jax.device_put(batch, self.data_sharding),
                          key)


# --------------------------------------------------------------------- #
# ViTEss
# --------------------------------------------------------------------- #

class ViTEssTrainer(_SpmdTrainer):
    """Reference loss (train.py:280-344, losson6d + use_normalized_6d):
    w_tr * MSE(pred_t, gt_t_norm) + w_rot * MSE(pred_r6, gt_r6_norm)."""

    def __init__(self, cfg: ViTEssConfig,
                 optim_cfg: OptimConfig = OptimConfig(),
                 w_tr: float = 10.0, w_rot: float = 10.0,
                 devices: Optional[list] = None):
        self.cfg = cfg
        self.model = ViTEss(cfg)
        self.w_tr, self.w_rot = w_tr, w_rot
        mean, std = VITESS_POSE_STATS[cfg.dataset]
        self._mean = np.asarray(mean, np.float32)
        self._std = np.asarray(std, np.float32)
        super().__init__(build_optimizer(optim_cfg), devices)

    def init(self, seed: int = 0, batch_size: int = 1,
             image_hw=(384, 512)) -> TrainState:
        H, W = image_hw
        images = jnp.zeros((batch_size, 2, H, W, 3), jnp.float32)
        sp = nc = None
        if self.cfg.use_loftr_gating:
            sp = jnp.tile(jnp.eye(3, 4)[None], (batch_size, 1, 1))
            nc = jnp.zeros((batch_size,), jnp.float32)
        init_fn = jax.jit(
            lambda k: self.model.init(k, images, sp, nc, train=False))
        variables = init_fn(jax.random.PRNGKey(seed))
        return self._make_state(variables)

    def _loss(self, params, batch_stats, batch: ViTEssBatch, key,
              train: bool = True):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (tran, R, pred_9d, gate), new_state = self.model.apply(
                variables, batch.images, batch.solver_rt,
                batch.solver_num_corr, train=True, mutable=["batch_stats"],
            )
            new_batch_stats = new_state["batch_stats"]
        else:
            tran, R, pred_9d, gate = self.model.apply(
                variables, batch.images, batch.solver_rt,
                batch.solver_num_corr, train=False,
            )
            new_batch_stats = batch_stats
        gt_t = batch.T_0to1[..., :3, 3]
        gt_r6 = matrix_to_rotation_6d(batch.T_0to1[..., :3, :3])
        if self.cfg.use_normalized_6d:
            mean = jnp.asarray(self._mean)
            std = jnp.asarray(self._std)
            gt_t = (gt_t - mean[:3]) / std[:3]
            gt_r6 = (gt_r6 - mean[3:]) / std[3:]
        loss_tr = jnp.mean((pred_9d[..., :3] - gt_t) ** 2)
        loss_rot = jnp.mean((pred_9d[..., 3:] - gt_r6) ** 2)
        loss = self.w_tr * loss_tr + self.w_rot * loss_rot
        aux = {
            "batch_stats": new_batch_stats,
            "metrics": {"loss": loss, "loss_tr": loss_tr,
                        "loss_rot": loss_rot},
        }
        return loss, aux


# --------------------------------------------------------------------- #
# map-free 6DReg
# --------------------------------------------------------------------- #

class SixDRegTrainer(_SpmdTrainer):
    """Solver (no grad, on-device) -> MapfreeRegression -> registry loss.

    Mirrors reference model.py:310-333 with LAMBDA semantics
    (rot + LAMBDA * trans; LAMBDA == 0 -> Kendall-Cipolla learnable s_r /
    s_t, carried as extra leaves of the param tree)."""

    def __init__(self, cfg: SixDRegConfig,
                 optim_cfg: OptimConfig = OptimConfig(),
                 rot_loss: str = "rot_6d_loss",
                 trans_loss: str = "trans_unnormalized_loss",
                 lam: float = 1.0,
                 pixel_thr: float = 2.0,
                 devices: Optional[list] = None):
        self.cfg = cfg
        self.model = MapfreeRegression(cfg)
        self.rot_loss, self.trans_loss, self.lam = rot_loss, trans_loss, lam
        # the reference solves with cv2.USAC_MAGSAC here (pose_solver.py:83)
        self.solver_cfg = SolverConfig(solver="ransac", pixel_thr=pixel_thr,
                                       scoring="magsac")
        super().__init__(build_optimizer(optim_cfg), devices)

    def init(self, seed: int = 0, batch_size: int = 1,
             image_hw=(270, 480)) -> TrainState:
        H, W = image_hw
        img = jnp.zeros((batch_size, H, W, 3), jnp.float32)
        rt = jnp.tile(jnp.eye(3, 4)[None], (batch_size, 1, 1))
        counts = jnp.zeros((batch_size, 3), jnp.float32)
        init_fn = jax.jit(
            lambda k: self.model.init(k, img, img, rt, counts, train=False))
        variables = init_fn(jax.random.PRNGKey(seed))
        params = dict(variables["params"])
        if self.lam == 0.0:  # Kendall-Cipolla learnable weights
            params["s_r"] = jnp.zeros((), jnp.float32)
            params["s_t"] = jnp.zeros((), jnp.float32)
        variables = {**variables, "params": params}
        return self._make_state(variables)

    def _loss(self, params, batch_stats, batch: MapfreeBatch, key,
              train: bool = True):
        model_params = {k: v for k, v in params.items()
                        if k not in ("s_r", "s_t")}
        variables = {"params": model_params, "batch_stats": batch_stats}

        kp0 = batch.corr[..., 0, :]
        kp1 = batch.corr[..., 1, :]
        est = estimate_pose(
            key, jax.lax.stop_gradient(kp0), jax.lax.stop_gradient(kp1),
            batch.K0, batch.K1, batch.corr_valid, cfg=self.solver_cfg,
        )
        counts = jax.lax.stop_gradient(jnp.stack(
            [est.num_inliers, est.num_tight, est.num_ultra_tight], -1))
        rt = jax.lax.stop_gradient(
            jnp.concatenate([est.R, est.t[..., None]], -1))

        if train:
            (R, t, pred_9d, gate), new_state = self.model.apply(
                variables, batch.image0, batch.image1, rt, counts,
                train=True, mutable=["batch_stats"],
            )
            new_batch_stats = new_state["batch_stats"]
        else:
            R, t, pred_9d, gate = self.model.apply(
                variables, batch.image0, batch.image1, rt, counts,
                train=False,
            )
            new_batch_stats = batch_stats
        total, parts = combined_loss(
            R, t, batch.T_0to1[..., :3, :3], batch.T_0to1[..., :3, 3],
            rot_loss=self.rot_loss, trans_loss=self.trans_loss,
            lam=self.lam,
            s_r=params.get("s_r"), s_t=params.get("s_t"),
        )
        aux = {
            "batch_stats": new_batch_stats,
            "metrics": {"loss": total,
                        "loss_rot": parts["rot_loss"],
                        "loss_tr": parts["trans_loss"],
                        "solver_inliers": jnp.mean(est.num_inliers)},
        }
        return total, aux
