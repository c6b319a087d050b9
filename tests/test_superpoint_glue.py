"""SuperPoint/SuperGlue-equivalent tests + sinkhorn/plotting/augment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from far_tpu.models.superglue import (
    SuperGlueConfig,
    SuperGlueTPU,
    match_pair_superglue,
)
from far_tpu.models.superpoint import SuperPointConfig, SuperPointTPU, simple_nms


pytestmark = pytest.mark.slow


class TestSuperPoint:
    def test_nms_keeps_local_maxima(self):
        s = jnp.zeros((1, 16, 16)).at[0, 4, 4].set(1.0).at[0, 4, 5].set(0.5)
        out = simple_nms(s, 2)
        assert float(out[0, 4, 4]) == 1.0
        assert float(out[0, 4, 5]) == 0.0

    def test_detector_shapes(self, rng):
        cfg = SuperPointConfig(channels=(8, 8, 16, 16), desc_dim=32,
                               max_keypoints=64)
        model = SuperPointTPU(cfg)
        img = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)), jnp.float32)
        vs = model.init(jax.random.PRNGKey(0), img)
        kpts, scores, valid, desc = model.apply(vs, img, mutable=False)
        assert kpts.shape == (2, 64, 2)
        assert desc.shape == (2, 64, 32)
        # descriptors unit norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-3)
        # keypoints inside the image
        assert float(kpts.max()) < 64


class TestSuperGlue:
    def test_identical_descriptors_match_identity(self, rng):
        cfg = SuperGlueConfig(desc_dim=32, num_layers=2, num_heads=4,
                              sinkhorn_iterations=10)
        model = SuperGlueTPU(cfg)
        K = 16
        kpts = jnp.asarray(rng.uniform(0, 64, size=(1, K, 2)), jnp.float32)
        scores = jnp.ones((1, K))
        valid = jnp.ones((1, K), bool)
        desc = jnp.asarray(rng.normal(size=(1, K, 32)), jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
        vs = model.init(jax.random.PRNGKey(0), kpts, scores, valid, desc,
                        kpts, scores, valid, desc, image_hw=(64, 64))
        # strengthen the similarity signal: same kpts/desc both sides ->
        # after training-free random weights, at least shapes/ranges hold
        m0, conf = model.apply(vs, kpts, scores, valid, desc,
                               kpts, scores, valid, desc,
                               image_hw=(64, 64), mutable=False)
        assert m0.shape == (1, K)
        assert conf.shape == (1, K)
        assert ((np.asarray(m0) >= -1) & (np.asarray(m0) < K)).all()

    def test_end_to_end_detector_matcher(self, rng):
        sp_cfg = SuperPointConfig(channels=(8, 8, 16, 16), desc_dim=32,
                                  max_keypoints=32,
                                  keypoint_threshold=0.0)
        sg_cfg = SuperGlueConfig(desc_dim=32, num_layers=1, num_heads=4,
                                 sinkhorn_iterations=5,
                                 match_threshold=0.0)
        sp = SuperPointTPU(sp_cfg)
        sg = SuperGlueTPU(sg_cfg)
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)), jnp.float32)
        sp_vs = sp.init(jax.random.PRNGKey(0), img)
        k, s, v, d = sp.apply(sp_vs, img, mutable=False)
        sg_vs = sg.init(jax.random.PRNGKey(1), k, s, v, d, k, s, v, d,
                        image_hw=(64, 64))
        pts0, pts1, ok = match_pair_superglue(sp, sp_vs, sg, sg_vs,
                                              img, img)
        assert pts0.shape == (1, 32, 2)
        assert np.isfinite(np.asarray(pts1)).all()


class TestSinkhornMatching:
    def test_log_sinkhorn_doubly_stochastic(self, rng):
        from far_tpu.models.matching import log_sinkhorn

        s = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
        Z = log_sinkhorn(s, jnp.asarray(0.5), iters=50)
        P = np.asarray(jnp.exp(Z))[0]
        # after the final -norm rescale (SuperGlue convention) each
        # non-dustbin row carries unit mass; total mass is L+S
        np.testing.assert_allclose(P.sum(), 16.0, atol=0.2)
        np.testing.assert_allclose(P[:-1].sum(1), 1.0, atol=0.05)
        np.testing.assert_allclose(P[:, :-1].sum(0), 1.0, atol=0.05)

    def test_sinkhorn_model_variant(self, rng):
        import dataclasses

        from far_tpu.pipeline import far_forward, init_model
        from tests.test_models import make_batch, small_config

        cfg = small_config()
        cfg = dataclasses.replace(
            cfg, match=dataclasses.replace(cfg.match,
                                           match_type="sinkhorn",
                                           skh_iters=3))
        model, variables = init_model(cfg, seed=0, batch_size=1)
        assert "bin_score" in variables["params"]
        batch = make_batch(rng, cfg, B=1)
        out = far_forward(model, variables, batch, jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out.R)).all()


class TestPlottingAugment:
    def test_matching_figure(self, rng):
        from far_tpu.utils.plotting import make_matching_figure

        img = rng.uniform(size=(32, 32))
        fig = make_matching_figure(
            img, img,
            rng.uniform(0, 32, (10, 2)), rng.uniform(0, 32, (10, 2)),
            epi_errs=rng.uniform(0, 1e-3, 10))
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_augmentors(self, rng):
        from far_tpu.data.augment import build_augmentor

        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        for name in ("dark", "mobile", "colorjitter"):
            out = build_augmentor(name)(img, rng)
            assert out.shape == img.shape
            assert out.min() >= 0 and out.max() <= 1
        assert build_augmentor(None) is None
