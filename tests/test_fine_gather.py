"""Equivalence of the strided-slice window gather vs the pointwise one."""

import numpy as np
import jax.numpy as jnp
import pytest

from far_tpu.models.fine import gather_windows, gather_windows_pointwise


@pytest.mark.parametrize(
    "stride,W",
    # strides above/below W, odd/even combos, and (advisor r4 #1) the
    # W > stride overlap cases; wc=7 exercises odd grid widths
    [(2, 5), (3, 5), (4, 5), (8, 5), (2, 3), (4, 7), (1, 5)],
)
@pytest.mark.parametrize("wc", [8, 7])
def test_gather_windows_equivalence(rng, stride, W, wc):
    B, C, hc = 2, 8, 6
    Hf, Wf = hc * stride, wc * stride
    feat = jnp.asarray(rng.normal(size=(B, Hf, Wf, C)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, hc * wc, size=(B, 16)), jnp.int32)
    a = gather_windows(feat, ids, (hc, wc), stride, W)
    b = gather_windows_pointwise(feat, ids, (hc, wc), stride, W)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gather_windows_border_zero_pad(rng):
    """Cells on the image border read zeros outside (unfold padding)."""
    B, Hf, Wf, C = 1, 8, 8, 2
    feat = jnp.ones((B, Hf, Wf, C), jnp.float32)
    ids = jnp.asarray([[0]], jnp.int32)  # top-left cell, center (0, 0)
    out = gather_windows(feat, ids, (2, 2), 4, 5)
    w = np.asarray(out[0, 0]).reshape(5, 5, C)
    assert (w[:2, :, :] == 0).all() and (w[:, :2, :] == 0).all()
    assert (w[2:, 2:, :] == 1).all()


def test_split_merge_matches_concat(rng):
    """fine.split_merge (the default) computes the identical merge with
    the identical parameter tree (kernel/bias at merge_feat, same init
    values) as the concat formulation."""
    import dataclasses

    import jax

    from far_tpu.models.fine import FinePreprocess
    from far_tpu.utils.config import FineConfig

    cfg = FineConfig(d_model=16, nhead=4, split_merge=False)
    cfg_s = dataclasses.replace(cfg, split_merge=True)
    B, Hf, Wf, K, Cc = 2, 16, 16, 4, 32
    hc, wc, stride = 4, 4, 4
    feat0 = jnp.asarray(rng.normal(size=(B, Hf, Wf, 16)), jnp.float32)
    feat1 = jnp.asarray(rng.normal(size=(B, Hf, Wf, 16)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, hc * wc, Cc)), jnp.float32)
    c1 = jnp.asarray(rng.normal(size=(B, hc * wc, Cc)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, hc * wc, size=(B, K)), jnp.int32)
    pre = FinePreprocess(cfg, d_model_c=Cc)
    pre_s = FinePreprocess(cfg_s, d_model_c=Cc)
    args = (feat0, feat1, c0, c1, ids, ids, (hc, wc), stride)
    v0 = pre.init(jax.random.PRNGKey(3), *args)
    v1 = pre_s.init(jax.random.PRNGKey(3), *args)
    # identical parameter trees, identical init values
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o0 = pre.apply(v0, *args)
    o1 = pre_s.apply(v0, *args)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o0[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1[1]), np.asarray(o0[1]),
                               atol=1e-5)
