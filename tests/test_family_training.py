"""Sharded train-step + convergence smokes for the ViTEss and 6DReg
training families (the FAR family lives in test_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.data.datasets import (
    GTCorrespondenceDataset,
    SolverPoseDataset,
    SyntheticPairDataset,
)
from far_tpu.models.sixdreg import SixDRegConfig
from far_tpu.models.vitess import ViTEssConfig
from far_tpu.train.family_trainers import (
    SixDRegTrainer,
    ViTEssTrainer,
    collate_sixdreg,
    collate_vitess,
)
from far_tpu.train.optim import OptimConfig


import pytest

pytestmark = pytest.mark.slow


def _tiny_vitess(**kw):
    return ViTEssConfig(dim=48, depth=2, num_heads=3, fc_hidden=64,
                        dtype="float32", **kw)


def _tiny_sixdreg():
    return SixDRegConfig(d_im=16, hidden=64, encoder_out_layers=8,
                         transformer_layers=1, transformer_heads=2,
                         encoder_blocks=(1, 1, 1), dtype="float32")


def _vitess_batch(n=8, hw=(64, 64), gated=False, seed=0):
    ds = SyntheticPairDataset(n=n, hw=hw, seed=seed)
    if gated:
        ds = SolverPoseDataset(ds, seed=seed)
    return collate_vitess([ds[i] for i in range(n)])


def _sixdreg_batch(n=8, hw=(64, 64), seed=0):
    ds = GTCorrespondenceDataset(
        SyntheticPairDataset(n=n, hw=hw, seed=seed), max_matches=128,
        seed=seed)
    return collate_sixdreg([ds[i] for i in range(n)])


OPT = OptimConfig(lr=3e-4, warmup_steps=0, scheduler="none")


class TestViTEssTraining:
    def test_8device_sharded_step(self):
        assert len(jax.devices()) == 8
        trainer = ViTEssTrainer(_tiny_vitess(), OPT)
        state = trainer.init(seed=0, batch_size=8, image_hw=(64, 64))
        batch = _vitess_batch()
        state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1

    def test_gated_step(self):
        trainer = ViTEssTrainer(_tiny_vitess(use_loftr_gating=True), OPT)
        state = trainer.init(seed=0, batch_size=8, image_hw=(64, 64))
        batch = _vitess_batch(gated=True)
        _, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    def test_convergence_smoke(self):
        trainer = ViTEssTrainer(_tiny_vitess(), OPT)
        state = trainer.init(seed=0, batch_size=8, image_hw=(64, 64))
        batch = _vitess_batch()  # one fixed batch -> loss must drop
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(12):
            key, sub = jax.random.split(key)
            state, metrics = trainer.step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses


class TestSixDRegTraining:
    def test_8device_sharded_step(self):
        assert len(jax.devices()) == 8
        trainer = SixDRegTrainer(_tiny_sixdreg(), OPT)
        state = trainer.init(seed=0, batch_size=8, image_hw=(64, 64))
        batch = _sixdreg_batch()
        state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["solver_inliers"]) > 8
        assert int(state2.step) == 1

    def test_kendall_cipolla_weights_learn(self):
        trainer = SixDRegTrainer(_tiny_sixdreg(), OPT, lam=0.0)
        state = trainer.init(seed=0, batch_size=8, image_hw=(64, 64))
        assert "s_r" in state.params and "s_t" in state.params
        batch = _sixdreg_batch()
        state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert float(jnp.abs(state2.params["s_r"])) > 0  # weights moved

    def test_convergence_smoke(self):
        trainer = SixDRegTrainer(_tiny_sixdreg(), OPT)
        state = trainer.init(seed=0, batch_size=8, image_hw=(64, 64))
        batch = _sixdreg_batch()
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(12):
            key, sub = jax.random.split(key)
            state, metrics = trainer.step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses
