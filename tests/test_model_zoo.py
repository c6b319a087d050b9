"""Smoke tests for the ViTEss, 6DReg, and SimpleTransformer families."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.models.simple_transformer import (
    SimpleTransformer,
    SimpleTransformerConfig,
)
from far_tpu.models.sixdreg import MapfreeRegression, SixDRegConfig
from far_tpu.models.vitess import ViTEss, ViTEssConfig


class TestViTEss:
    def test_forward_shapes(self, rng):
        cfg = ViTEssConfig(dim=48, depth=3, num_heads=3, fc_hidden=64,
                           feature_hw=(24, 24), dtype="float32")
        model = ViTEss(cfg)
        imgs = jnp.asarray(rng.uniform(size=(2, 2, 96, 96, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs)
        tran, R, pose9, gate = model.apply(variables, imgs, mutable=False)
        assert tran.shape == (2, 3)
        assert R.shape == (2, 3, 3)
        # R orthonormal
        RRt = np.asarray(jnp.matmul(R, jnp.swapaxes(R, -1, -2)))
        np.testing.assert_allclose(RRt, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-3)
        assert gate is None

    def test_gating_path(self, rng):
        cfg = ViTEssConfig(dim=48, depth=2, num_heads=3, fc_hidden=64,
                           use_loftr_gating=True, dtype="float32")
        model = ViTEss(cfg)
        imgs = jnp.asarray(rng.uniform(size=(1, 2, 96, 96, 3)), jnp.float32)
        sp = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
        nc = jnp.asarray([120.0])
        variables = model.init(jax.random.PRNGKey(0), imgs, sp, nc)
        tran, R, pose9, gate = model.apply(variables, imgs, sp, nc,
                                           mutable=False)
        assert gate.shape == (1, 2)
        assert np.isfinite(np.asarray(pose9)).all()


class TestMapfreeRegression:
    def test_forward_shapes(self, rng):
        cfg = SixDRegConfig(
            image_hw=(64, 48), encoder_blocks=(1, 1, 1),
            encoder_bottleneck=True, encoder_out_layers=8,
            transformer_layers=1, transformer_heads=4, d_im=256,
            hidden=32, dtype="float32",
        )
        model = MapfreeRegression(cfg)
        H, W = cfg.image_hw
        im0 = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
        im1 = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
        rt = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
        inl = jnp.ones((2, 3)) * 50
        variables = model.init(jax.random.PRNGKey(0), im0, im1, rt, inl)
        R, t, pose9, gate = model.apply(variables, im0, im1, rt, inl,
                                        mutable=False)
        assert R.shape == (2, 3, 3)
        assert t.shape == (2, 3)
        assert gate.shape == (2, 2)
        RRt = np.asarray(jnp.matmul(R, jnp.swapaxes(R, -1, -2)))
        np.testing.assert_allclose(RRt, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-3)

    def test_correlation_warp_identity(self, rng):
        """Warping a volume against itself with sharp features returns
        (approximately) the same volume."""
        from far_tpu.models.sixdreg import CorrelationVolumeWarping

        cfg = SixDRegConfig(position_encoder=False, max_score_channel=False,
                            dtype="float32")
        # orthogonal one-hot features: self-similarity strictly dominates
        vol = (jnp.eye(16) * 10.0).reshape(1, 4, 4, 16)
        agg = CorrelationVolumeWarping(cfg)
        out = agg.apply({}, vol, vol)
        B, H, W, C = out.shape
        assert C == 32
        np.testing.assert_allclose(
            np.asarray(out[..., 16:]), np.asarray(vol), atol=1e-3)


class TestSimpleTransformer:
    def test_forward(self, rng):
        cfg = SimpleTransformerConfig(feat_size=64, num_heads=4,
                                      num_layers=2, hidden=64)
        model = SimpleTransformer(cfg)
        corr = jnp.asarray(rng.uniform(size=(2, 32, 2, 2)) * 100, jnp.float32)
        valid = jnp.ones((2, 32), bool).at[:, 20:].set(False)
        rt = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
        nc = jnp.asarray([100.0, 50.0])
        variables = model.init(jax.random.PRNGKey(0), corr, valid, rt, nc)
        pose9, gate = model.apply(variables, corr, valid, rt, nc,
                                  mutable=False)
        assert pose9.shape == (2, 9)
        assert gate.shape == (2, 2)
        assert np.isfinite(np.asarray(pose9)).all()

    def test_padding_invariance(self, rng):
        """Masked-out padding tokens must not change the prediction."""
        cfg = SimpleTransformerConfig(feat_size=64, num_heads=4,
                                      num_layers=1, hidden=32)
        model = SimpleTransformer(cfg)
        corr = jnp.asarray(rng.uniform(size=(1, 16, 2, 2)), jnp.float32)
        valid = jnp.ones((1, 16), bool).at[:, 8:].set(False)
        rt = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
        nc = jnp.asarray([8.0])
        variables = model.init(jax.random.PRNGKey(0), corr, valid, rt, nc)
        p1, _ = model.apply(variables, corr, valid, rt, nc, mutable=False)
        corr2 = corr.at[:, 8:].set(777.0)  # perturb only padded slots
        p2, _ = model.apply(variables, corr2, valid, rt, nc, mutable=False)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-2)
