"""CPU-side contracts of the Pallas kernel seams.

The kernels themselves only run on TPU; what CI can pin down is
(a) the jnp reference implementations the kernels are validated
against, (b) the streaming autodiff twins, and (c) the custom_vjp
wiring that training differentiates through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far_tpu.ops.bilinear_attention import (
    bilinear_dual_softmax,
    bilinear_dual_softmax_reference,
    bilinear_dual_softmax_streaming,
)
from far_tpu.ops.loftr_layer import (
    fused_loftr_layer_reference,
    loftr_layer_auto,
)


def _layer_params(rng, C):
    k = lambda *s: jnp.asarray(rng.normal(size=s) * 0.07, jnp.float32)
    return dict(
        wq=k(C, C), wk=k(C, C), wv=k(C, C), wm=k(C, C),
        w0x=k(C, 2 * C), w0m=k(C, 2 * C), w1=k(2 * C, C),
        ln1=jnp.stack([jnp.ones(C), jnp.zeros(C)]),
        ln2=jnp.stack([jnp.ones(C), jnp.zeros(C)]),
    )


class TestLoftrLayerReference:
    def test_matches_structured_module_path(self, rng):
        """The einsum reference == the LoFTREncoderLayer fallback path
        (same params, masked-free linear attention)."""
        from far_tpu.models.transformer import LoFTREncoderLayer

        B, L, C, H = 2, 48, 128, 8
        x = jnp.asarray(rng.normal(size=(B, L, C)) * 0.5, jnp.float32)
        src = jnp.asarray(rng.normal(size=(B, L, C)) * 0.5, jnp.float32)
        layer = LoFTREncoderLayer(C, H, "linear", jnp.float32)
        variables = layer.init(jax.random.PRNGKey(0), x, src)
        out_mod = layer.apply(variables, x, src)

        p = variables["params"]
        params = dict(
            wq=p["q_proj"]["kernel"], wk=p["k_proj"]["kernel"],
            wv=p["v_proj"]["kernel"], wm=p["merge"]["kernel"],
            w0x=p["mlp_0"]["kernel"][:C], w0m=p["mlp_0"]["kernel"][C:],
            w1=p["mlp_1"]["kernel"],
            ln1=jnp.stack([p["norm1"]["scale"], p["norm1"]["bias"]]),
            ln2=jnp.stack([p["norm2"]["scale"], p["norm2"]["bias"]]),
        )
        out_ref = fused_loftr_layer_reference(x, src, params, H)
        np.testing.assert_allclose(
            np.asarray(out_mod), np.asarray(out_ref), atol=2e-5)

    def test_custom_vjp_grads_match_reference(self, rng):
        B, L, C, H = 2, 32, 128, 8
        x = jnp.asarray(rng.normal(size=(B, L, C)) * 0.5, jnp.float32)
        p = _layer_params(rng, C)

        loss_auto = lambda x, p: jnp.sum(loftr_layer_auto(x, x, p, H) ** 2)
        loss_ref = lambda x, p: jnp.sum(
            fused_loftr_layer_reference(x, x, p, H) ** 2)
        ga = jax.grad(loss_auto, argnums=(0, 1))(x, p)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, p)
        np.testing.assert_allclose(
            np.asarray(ga[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
        for key in ga[1]:
            np.testing.assert_allclose(
                np.asarray(ga[1][key]), np.asarray(gr[1][key]),
                rtol=1e-4, atol=1e-5, err_msg=key)


class TestBilinearStreaming:
    @pytest.mark.parametrize("N,block", [(256, 64), (512, 128)])
    def test_streaming_matches_reference(self, rng, N, block):
        B, H, D = 1, 2, 16
        q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        r = bilinear_dual_softmax_reference(q, k, v, 0.25)
        s = bilinear_dual_softmax_streaming(q, k, v, 0.25, block=block)
        np.testing.assert_allclose(np.asarray(r), np.asarray(s),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_at_production_n(self, rng):
        """N=1200 is >= 1024 but not divisible by the default 512 block:
        the backward must pass _pick_block(N) to the streaming twin
        (the production coarse count N=4800 has the same property)."""
        B, H, N, D = 1, 1, 1200, 8
        q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        ga = jax.grad(lambda q, k, v: jnp.sum(
            bilinear_dual_softmax(q, k, v, 0.3) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            bilinear_dual_softmax_reference(q, k, v, 0.3) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(ga, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=1e-6)

    def test_custom_vjp_grads_match_reference(self, rng):
        # N >= 1024 routes the backward through the streaming twin
        B, H, N, D = 1, 1, 1024, 8
        q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        ga = jax.grad(lambda q, k, v: jnp.sum(
            bilinear_dual_softmax(q, k, v, 0.3) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            bilinear_dual_softmax_reference(q, k, v, 0.3) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(ga, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=1e-6)
