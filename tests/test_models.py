"""Model smoke + correctness tests on a small config (fast on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from far_tpu.pipeline import build_inference_fn, far_forward, init_model
from far_tpu.types import PairBatch
from far_tpu.utils.config import (
    AttentionStackConfig,
    BackboneConfig,
    FARConfig,
    FineConfig,
    MatchConfig,
    RegressConfig,
    SolverOptions,
)


def small_config(**kw) -> FARConfig:
    return FARConfig(
        image_size=(64, 64),
        backbone=BackboneConfig(initial_dim=16, block_dims=(16, 24, 32)),
        coarse=AttentionStackConfig(
            d_model=32, nhead=4, layer_names=("self", "cross") * 2
        ),
        match=MatchConfig(thr=0.0, border_rm=1, max_matches=32),
        fine=FineConfig(d_model=16, nhead=4, window_size=5),
        regress=RegressConfig(d_model=32, emm_heads=4, hidden=64),
        solver=SolverOptions(num_hypotheses=128, fine_pred_steps=2),
        **kw,
    )


def make_batch(rng, cfg, B=2):
    H, W = cfg.image_size
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    return PairBatch(
        image0=jnp.asarray(rng.uniform(size=(B, H, W, 1)), jnp.float32),
        image1=jnp.asarray(rng.uniform(size=(B, H, W, 1)), jnp.float32),
        K0=jnp.tile(jnp.asarray(K)[None], (B, 1, 1)),
        K1=jnp.tile(jnp.asarray(K)[None], (B, 1, 1)),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = small_config()
    model, variables = init_model(cfg, seed=0, batch_size=2)
    return cfg, model, variables


class TestMatcher:
    def test_match_shapes(self, model_and_vars, rng):
        cfg, model, variables = model_and_vars
        batch = make_batch(rng, cfg)
        out = model.apply(variables, batch, method="match", mutable=False)
        hc, wc = cfg.coarse_hw
        K = cfg.match.max_matches
        assert out.feat_c0.shape == (2, hc * wc, cfg.coarse.d_model)
        assert out.matches.i_ids.shape == (2, K)
        assert out.matches.mkpts0_f.shape == (2, K, 2)
        assert out.conf_matrix is None  # only materialized for training
        out_t, _ = model.apply(
            variables, batch, train=True, method="match",
            mutable=["batch_stats"],
        )
        assert out_t.conf_matrix.shape == (2, hc * wc, hc * wc)
        # kpts within image bounds
        assert float(out.matches.mkpts0_f.max()) <= cfg.image_size[1]
        assert np.isfinite(np.asarray(out.matches.expec_f)).all()

    def test_identical_images_match_diagonal(self, model_and_vars, rng):
        """Same image twice: mutual-NN should prefer i==j matches."""
        cfg, model, variables = model_and_vars
        H, W = cfg.image_size
        img = jnp.asarray(rng.uniform(size=(1, H, W, 1)), jnp.float32)
        K = jnp.eye(3)[None]
        batch = PairBatch(image0=img, image1=img, K0=K, K1=K)
        out = model.apply(variables, batch, method="match", mutable=False)
        m = out.matches
        valid = np.asarray(m.valid[0])
        if valid.any():
            ii = np.asarray(m.i_ids[0])[valid]
            jj = np.asarray(m.j_ids[0])[valid]
            assert (ii == jj).mean() > 0.9


class TestFarPipeline:
    def test_far_forward_finite(self, model_and_vars, rng):
        cfg, model, variables = model_and_vars
        batch = make_batch(rng, cfg)
        out = far_forward(model, variables, batch, jax.random.PRNGKey(0))
        R = np.asarray(out.R)
        assert R.shape == (2, 3, 3)
        # fused rotation must be orthonormal (comes from 6D Gram-Schmidt)
        for b in range(2):
            np.testing.assert_allclose(R[b] @ R[b].T, np.eye(3), atol=1e-3)
        assert np.isfinite(np.asarray(out.t)).all()
        assert np.isfinite(np.asarray(out.regressed_9d)).all()
        assert out.gating.shape == (2, 2)  # use_2wt default

    def test_far_forward_jits(self, model_and_vars, rng):
        cfg, model, variables = model_and_vars
        batch = make_batch(rng, cfg)
        fn = build_inference_fn(model)
        out = fn(variables, batch, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out.R)).all()

    def test_no_regressor_config(self, rng):
        cfg = small_config(regress_rt=False)
        model, variables = init_model(cfg, seed=0, batch_size=1)
        batch = make_batch(rng, cfg, B=1)
        out = model.apply(variables, batch, method="match", mutable=False)
        assert out.matches.mkpts0_f.shape[0] == 1
