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


class TestTinyWindowAttention:
    """The MXU-batched tiny-window branch of linear_attention (head-block
    masked full-C matmuls, attention.py:53-76) must agree with the
    general einsum path in values and gradients."""

    def _general(self, q, k, v, eps=1e-6):
        from far_tpu.models.attention import elu_feature_map

        Q, K = elu_feature_map(q), elu_feature_map(k)
        vl = v.shape[1]
        vn = v / vl
        KV = jnp.einsum("nshd,nshv->nhdv", K, vn)
        Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
        return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl

    @pytest.mark.parametrize("l,s", [(25, 25), (25, 9), (1, 32)])
    def test_matches_general_path(self, rng, l, s):
        from far_tpu.models.attention import linear_attention

        n, h, d = 6, 8, 16
        q = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(n, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, s, h, d)), jnp.float32)
        assert l <= 32 and s <= 32  # the tiny-branch trigger
        out = linear_attention(q, k, v)
        ref = self._general(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients_match_general_path(self, rng):
        from far_tpu.models.attention import linear_attention

        n, l, h, d = 2, 25, 4, 8
        q = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        g_tiny = jax.grad(lambda *a: jnp.sum(linear_attention(*a) ** 2),
                          argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(lambda *a: jnp.sum(self._general(*a) ** 2),
                         argnums=(0, 1, 2))(q, k, v)
        for gt, gr in zip(g_tiny, g_ref):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                       atol=1e-4, rtol=1e-4)

    def test_masked_windows(self, rng):
        """kv/q masks are applied before the branch; a masked-out tail
        must not change the unmasked rows' output."""
        from far_tpu.models.attention import linear_attention

        n, l, h, d = 3, 25, 4, 8
        q = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, l, h, d)), jnp.float32)
        kv_mask = jnp.ones((n, l), bool).at[:, 20:].set(False)
        out_masked = linear_attention(q, k, v, kv_mask=kv_mask)
        out_trunc = linear_attention(q, k[:, :20], v[:, :20])
        # v_length normalization cancels; only the K/V support matters
        np.testing.assert_allclose(np.asarray(out_masked),
                                   np.asarray(out_trunc),
                                   atol=1e-5, rtol=1e-5)
