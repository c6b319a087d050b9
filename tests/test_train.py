"""Trainer tests: loss math, supervision, and an 8-device sharded step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from far_tpu.train.losses import coarse_loss, fine_loss, rt_loss
from far_tpu.train.optim import OptimConfig, build_optimizer, build_schedule
from far_tpu.train.supervision import coarse_supervision
from far_tpu.train.trainer import Trainer
from far_tpu.types import PairBatch
from far_tpu.utils.config import LossConfig
from tests.test_models import make_batch, small_config


class TestLosses:
    def test_coarse_focal_perfect_prediction(self):
        gt = jnp.zeros((1, 8, 8)).at[0, 2, 3].set(1.0)
        conf_good = jnp.full((1, 8, 8), 1e-4).at[0, 2, 3].set(0.999)
        conf_bad = jnp.full((1, 8, 8), 1e-4).at[0, 2, 3].set(1e-4)
        cfg = LossConfig()
        good = float(coarse_loss(conf_good, gt, cfg, sparse_spvs=True))
        bad = float(coarse_loss(conf_bad, gt, cfg, sparse_spvs=True))
        assert good < bad

    def test_fine_loss_masks_invalid(self):
        expec = jnp.zeros((1, 4, 3)).at[..., 2].set(1.0)
        gt = jnp.asarray([[[0.1, 0.1], [5.0, 5.0], [0.2, 0.2], [0.0, 0.0]]])
        valid = jnp.asarray([[True, True, False, False]])
        cfg = LossConfig()
        # slot 1 has out-of-window gt (excluded); slot 2/3 invalid
        loss = float(fine_loss(expec, gt, valid, cfg))
        expected = (0.1 ** 2 + 0.1 ** 2)
        np.testing.assert_allclose(loss, expected, rtol=1e-4)

    def test_rt_loss_zero_at_gt(self):
        from far_tpu.models.constants import compute_normalized_6d

        T = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
        pose = compute_normalized_6d(T[:, :3, :4])
        l_tr, l_rot = rt_loss(pose, T, LossConfig())
        assert float(l_tr) < 1e-6 and float(l_rot) < 1e-6


class TestOptim:
    def test_schedule_warmup(self):
        cfg = OptimConfig(lr=1e-3, warmup_steps=100, warmup_ratio=0.0,
                          scheduler="none")
        s = build_schedule(cfg)
        assert float(s(0)) < 1e-8
        np.testing.assert_allclose(float(s(50)), 5e-4, rtol=1e-3)
        np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-3)

    def test_nonfinite_grads_skipped(self):
        tx = build_optimizer(OptimConfig(lr=1e-2, warmup_steps=0,
                                         scheduler="none"))
        params = {"w": jnp.ones(3)}
        st = tx.init(params)
        bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
        up, st = tx.update(bad, st, params)
        np.testing.assert_allclose(np.asarray(up["w"]), 0.0)


class TestSupervision:
    def test_coarse_supervision_identity(self, rng):
        """Identity pose + constant depth -> diagonal GT matches."""
        H = W = 64
        B = 1
        K = np.array([[[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]]], np.float32)
        T = np.tile(np.eye(4)[None], (B, 1, 1)).astype(np.float32)
        batch = PairBatch(
            image0=jnp.zeros((B, H, W, 1)),
            image1=jnp.zeros((B, H, W, 1)),
            K0=jnp.asarray(K), K1=jnp.asarray(K),
            T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
            depth0=jnp.full((B, H, W), 2.0),
            depth1=jnp.full((B, H, W), 2.0),
        )
        conf_gt, w_pt0, pt1 = coarse_supervision(batch, (8, 8), 8.0)
        gt = np.asarray(conf_gt[0])
        # all diagonal except cell 0 (reference also drops it)
        diag = np.diag(gt)
        assert diag[1:].sum() == 63
        off = gt - np.diag(diag)
        assert off.sum() == 0


class TestShardedTraining:
    def test_8device_train_step(self, rng):
        """Full train step over a virtual 8-device data mesh."""
        assert len(jax.devices()) == 8
        cfg = small_config()
        trainer = Trainer(
            cfg,
            OptimConfig(lr=1e-4, warmup_steps=0, scheduler="none"),
        )
        state = trainer.init(seed=0, batch_size=8)
        batch = make_batch(rng, cfg, B=8)
        # add supervision fields
        H, W = cfg.image_size
        T = np.tile(np.eye(4)[None], (8, 1, 1)).astype(np.float32)
        batch = batch.replace(
            T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
            depth0=jnp.full((8, H, W), 2.0), depth1=jnp.full((8, H, W), 2.0),
        )
        state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1
        # params actually moved
        delta = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state2.params,
            jax.device_put(trainer.init(seed=0, batch_size=8).params),
        )
        assert max(jax.tree.leaves(delta)) > 0

    @pytest.mark.slow
    @pytest.mark.parametrize("remat", [True, "selective"])
    def test_remat_train_step_matches_plain(self, rng, remat):
        """cfg.remat (full backbone jax.checkpoint, or the selective
        save-conv-outputs policy) must produce the same loss/grads as
        the plain step — it only changes what is recomputed in the
        backward, not the math."""
        H = W = 64
        T = np.tile(np.eye(4)[None], (8, 1, 1)).astype(np.float32)

        def one_step(remat):
            cfg = small_config(remat=remat)
            trainer = Trainer(
                cfg, OptimConfig(lr=1e-4, warmup_steps=0, scheduler="none"))
            state = trainer.init(seed=0, batch_size=8)
            batch = make_batch(np.random.default_rng(0), cfg, B=8).replace(
                T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
                depth0=jnp.full((8, H, W), 2.0),
                depth1=jnp.full((8, H, W), 2.0),
            )
            _, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
            return float(metrics["loss"]), float(metrics["grad_norm"])

        loss_p, gn_p = one_step(False)
        loss_r, gn_r = one_step(remat)
        assert np.isfinite(loss_r)
        np.testing.assert_allclose(loss_r, loss_p, rtol=1e-4)
        np.testing.assert_allclose(gn_r, gn_p, rtol=1e-3)

    def test_two_steps_loss_finite(self, rng):
        cfg = small_config()
        trainer = Trainer(
            cfg, OptimConfig(lr=1e-4, warmup_steps=0, scheduler="none")
        )
        state = trainer.init(seed=0, batch_size=8)
        H, W = cfg.image_size
        T = np.tile(np.eye(4)[None], (8, 1, 1)).astype(np.float32)
        batch = make_batch(rng, cfg, B=8).replace(
            T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
            depth0=jnp.full((8, H, W), 2.0), depth1=jnp.full((8, H, W), 2.0),
        )
        for i in range(2):
            state, metrics = trainer.step(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["loss"]))
