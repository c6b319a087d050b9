"""Fused fine-window transformer kernel vs the jnp reference.

The Pallas kernel (far_tpu/ops/fine_layer.py) must match the unfused
linear-attention layer stack bit-for-tolerance: these tests run the
kernel in interpreter mode on CPU against fine_transformer_reference
and against the LoFTREncoderLayer XLA path that served the fine stage
through round 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far_tpu.ops.fine_layer import (
    _fused,
    fine_transformer_auto,
    fine_transformer_reference,
)


def _make_params(key, C, n_layers):
    params = []
    for i in range(n_layers):
        k = jax.random.fold_in(key, i)
        ks = jax.random.split(k, 7)
        params.append({
            "wq": jax.random.normal(ks[0], (C, C)) * 0.05,
            "wk": jax.random.normal(ks[1], (C, C)) * 0.05,
            "wv": jax.random.normal(ks[2], (C, C)) * 0.05,
            "wm": jax.random.normal(ks[3], (C, C)) * 0.05,
            "w0x": jax.random.normal(ks[4], (C, 2 * C)) * 0.05,
            "w0m": jax.random.normal(ks[5], (C, 2 * C)) * 0.05,
            "w1": jax.random.normal(ks[6], (2 * C, C)) * 0.05,
            "ln1": jnp.stack([jnp.ones(C), jnp.zeros(C)]),
            "ln2": jnp.stack([jnp.ones(C), jnp.zeros(C)]),
        })
    return params


@pytest.mark.parametrize("n,s", [(10, 25), (64, 25), (7, 9)])
def test_fused_matches_reference(n, s):
    C, H = 128, 8
    key = jax.random.PRNGKey(0)
    f0 = jax.random.normal(jax.random.fold_in(key, 1), (n, s, C))
    f1 = jax.random.normal(jax.random.fold_in(key, 2), (n, s, C))
    params = _make_params(key, C, 2)
    names = ("self", "cross")

    ref0, ref1 = fine_transformer_reference(f0, f1, params, names, H)
    out0, out1 = _fused(f0, f1, params, names, H)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=2e-4, atol=2e-4)


def test_reference_matches_unfused_layer_stack():
    """fine_transformer_reference == the per-layer XLA path that served
    the fine stage through round 4 (LoFTREncoderLayer with the
    tiny-window linear attention branch)."""
    from far_tpu.models.transformer import LocalFeatureTransformer

    n, s, C, H = 12, 25, 128, 8
    key = jax.random.PRNGKey(3)
    f0 = jax.random.normal(jax.random.fold_in(key, 1), (n, s, C))
    f1 = jax.random.normal(jax.random.fold_in(key, 2), (n, s, C))

    ft = LocalFeatureTransformer(
        d_model=C, nhead=H, layer_names=("self", "cross"),
        attention="linear")  # window_tokens=None -> unfused path
    variables = ft.init(jax.random.PRNGKey(4), f0, f1)
    old0, old1 = ft.apply(variables, f0, f1)

    params = [
        {**{k2: variables["params"][f"layer_{i}_{nm}"][src]["kernel"]
            for k2, src in [("wq", "q_proj"), ("wk", "k_proj"),
                            ("wv", "v_proj"), ("wm", "merge")]},
         "w0x": variables["params"][f"layer_{i}_{nm}"]["mlp_0"]["kernel"][:C],
         "w0m": variables["params"][f"layer_{i}_{nm}"]["mlp_0"]["kernel"][C:],
         "w1": variables["params"][f"layer_{i}_{nm}"]["mlp_1"]["kernel"],
         "ln1": jnp.stack(
             [variables["params"][f"layer_{i}_{nm}"]["norm1"]["scale"],
              variables["params"][f"layer_{i}_{nm}"]["norm1"]["bias"]]),
         "ln2": jnp.stack(
             [variables["params"][f"layer_{i}_{nm}"]["norm2"]["scale"],
              variables["params"][f"layer_{i}_{nm}"]["norm2"]["bias"]])}
        for i, nm in enumerate(("self", "cross"))
    ]
    new0, new1 = fine_transformer_reference(
        f0, f1, params, ("self", "cross"), H)
    np.testing.assert_allclose(np.asarray(new0), np.asarray(old0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new1), np.asarray(old1),
                               rtol=1e-4, atol=1e-4)


def test_fine_matching_dispatch_and_grad():
    """FineMatching with window_tokens set still produces the same
    output on CPU (reference fallback) and is differentiable."""
    from far_tpu.models.fine import FineMatching
    from far_tpu.utils.config import FineConfig

    m = FineMatching(cfg=FineConfig())
    f0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 25, 128))
    f1 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 25, 128))
    v = m.init(jax.random.PRNGKey(2), f0, f1)
    out = m.apply(v, f0, f1)
    assert out.shape == (2, 8, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return jnp.sum(m.apply({"params": params}, f0, f1) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_fine_matching_train_path_matches_eval():
    """train=True runs the plain AD-transparent layer loop (no fused
    dispatch, no custom_vjp); same params, same outputs as eval."""
    from far_tpu.models.fine import FineMatching
    from far_tpu.utils.config import FineConfig

    m = FineMatching(cfg=FineConfig())
    f0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 25, 128))
    f1 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 25, 128))
    v = m.init(jax.random.PRNGKey(2), f0, f1)
    out_eval = m.apply(v, f0, f1)
    out_train = m.apply(v, f0, f1, train=True)
    np.testing.assert_allclose(np.asarray(out_train),
                               np.asarray(out_eval), rtol=1e-5, atol=1e-5)

    def loss(params):
        return jnp.sum(m.apply({"params": params}, f0, f1,
                               train=True) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
