"""Data-parallel trainer: one jitted SPMD train step over a device mesh.

The reference scales with DDP over NCCL (crockwell/far:
mp3d_loftr/train.py:347-359, comm.py). Here parallelism is declarative:
a 1-D `jax.sharding.Mesh` over the 'data' axis, the batch sharded on it,
parameters replicated, and XLA inserts the gradient psums over ICI.
BatchNorm becomes sync-BN for free: its batch-mean reduction crosses the
sharded axis, so the compiler emits the cross-replica collective the
reference needed SyncBatchNorm for.

Train-step semantics mirror PL_LoFTR._trainval_inference
(lightning_loftr.py:129-172):
  1. coarse/fine supervision from depth warps (no grad),
  2. matcher forward (grad),
  3. solver pseudo-GT + FAR regression rounds; earlier rounds feed the
     prior without gradient, the final round is differentiated,
  4. focal + fine + RT losses; NaN-grad skip; clip; warmup schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from far_tpu.models.loftr import FARLoFTR
from far_tpu.models.constants import denormalize_9d
from far_tpu.pipeline import make_solver_configs, _summarize
from far_tpu.solvers.pose_estimation import estimate_pose
from far_tpu.train.losses import FarLosses, compute_losses
from far_tpu.train.optim import OptimConfig, build_optimizer
from far_tpu.train.supervision import coarse_supervision, fine_supervision
from far_tpu.types import PairBatch
from far_tpu.utils.config import FARConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model: FARLoFTR, variables: Dict[str, Any], tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(model: FARLoFTR, tx: optax.GradientTransformation):
    """Builds the (state, batch, key) -> (state, metrics) step function."""
    cfg = model.config
    first_cfg, refine_cfg = make_solver_configs(cfg)
    coarse_stride = float(cfg.backbone.resolution[0])
    fine_stride = float(cfg.backbone.resolution[1])

    def loss_fn(params, batch_stats, batch: PairBatch, key):
        variables = {"params": params, "batch_stats": batch_stats}
        (out), new_state = model.apply(
            variables, batch, train=True, method=FARLoFTR.match,
            mutable=["batch_stats"],
        )
        m = out.matches

        # ---- supervision (no gradient) --------------------------------
        sup = jax.lax.stop_gradient(
            coarse_supervision(batch, cfg.coarse_hw, coarse_stride)
        )
        conf_gt, w_pt0, pt1 = sup
        expec_f_gt = jax.lax.stop_gradient(
            fine_supervision(
                w_pt0, pt1, m.i_ids, m.j_ids, fine_stride,
                cfg.fine.window_size, batch.scale1,
            )
        )

        pose_9d = None
        gate = None
        if cfg.regress_rt:
            kp0 = jax.lax.stop_gradient(m.mkpts0_f)
            kp1 = jax.lax.stop_gradient(m.mkpts1_f)
            valid = m.valid
            num_before = jnp.sum(valid.astype(jnp.float32), -1)
            variables_now = {"params": params,
                             "batch_stats": new_state["batch_stats"]}
            # EMM features are solver-independent -> one pass per step
            features = model.apply(
                variables_now, out.feat_c0, out.feat_c1,
                method=FARLoFTR.regress_features, mutable=False,
            )
            k0, k1 = jax.random.split(key)
            est = estimate_pose(
                k0, kp0, kp1, batch.K0, batch.K1, valid, cfg=first_cfg
            )
            summary = _summarize(est, num_before)
            pose_9d, gate, _ = model.apply(
                variables_now, features, summary,
                method=FARLoFTR.regress_fuse, mutable=False,
            )
            # refinement rounds: prior comes from a detached copy
            keys = jax.random.split(k1, max(cfg.solver.fine_pred_steps - 1, 0))
            for i in range(cfg.solver.fine_pred_steps - 1):
                prior_rt = jax.lax.stop_gradient(denormalize_9d(pose_9d))
                est = estimate_pose(
                    keys[i], kp0, kp1, batch.K0, batch.K1, valid,
                    prior_rt=prior_rt, cfg=refine_cfg,
                )
                summary = _summarize(est, num_before)
                pose_9d, gate, _ = model.apply(
                    variables_now, features, summary,
                    method=FARLoFTR.regress_fuse, mutable=False,
                )

        losses = compute_losses(
            cfg.loss,
            conf=out.conf_matrix,
            conf_gt=conf_gt,
            expec_f=m.expec_f,
            expec_f_gt=expec_f_gt,
            fine_valid=m.valid,
            pose_9d=pose_9d,
            T_0to1=batch.T_0to1,
            translation_scale=out.translation_scale
            if cfg.predict_translation_scale else None,
            sparse_spvs=cfg.match.sparse_spvs,
        )
        aux = {
            "losses": losses,
            "batch_stats": new_state["batch_stats"],
            "num_matches": jnp.mean(jnp.sum(m.valid.astype(jnp.float32), -1)),
        }
        return losses.total, aux

    def train_step(state: TrainState, batch: PairBatch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt,
        )
        metrics = {**aux["losses"].scalars(),
                   "num_matches": aux["num_matches"],
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


class Trainer:
    """Mesh-aware driver around the jitted train step.

    Usage:
        trainer = Trainer(cfg, optim_cfg, mesh_devices)
        state = trainer.init(seed=0, batch_size_per_step=...)
        state, metrics = trainer.step(state, batch, key)
    """

    def __init__(
        self,
        cfg: FARConfig,
        optim_cfg: OptimConfig = OptimConfig(),
        devices: Optional[list] = None,
    ):
        self.cfg = cfg
        self.model = FARLoFTR(cfg)
        self.tx = build_optimizer(optim_cfg)
        devices = devices if devices is not None else jax.devices()
        self.mesh = Mesh(np.asarray(devices), ("data",))
        self.repl = NamedSharding(self.mesh, P())
        self.data_sharding = NamedSharding(self.mesh, P("data"))

        step = make_train_step(self.model, self.tx)
        self._step = jax.jit(
            step,
            in_shardings=(self.repl, self.data_sharding, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )

    def init(self, seed: int = 0, batch_size: int = 1) -> TrainState:
        from far_tpu.pipeline import init_model

        _, variables = init_model(self.cfg, seed=seed, batch_size=batch_size)
        state = create_train_state(self.model, variables, self.tx)
        return jax.device_put(state, self.repl)

    def shard_batch(self, batch: PairBatch) -> PairBatch:
        return jax.device_put(batch, self.data_sharding)

    def step(self, state, batch, key):
        return self._step(state, self.shard_batch(batch), key)
