"""Activation + converter parity against the REAL torch reference.

These tests instantiate the actual reference implementations from
/root/reference (CPU torch, seeded random init), record activations via
tests.refloader's fixture recorders, push the real ``state_dict()``
through our converters, replay the recorded inputs through our Flax
models, and assert per-tap max error.

This is the end of the "self-referential converter test" era: the state
dicts here are produced by the reference modules themselves, so a
missing / typo'd torch key in a mapping fails loudly (run_parity raises
on missing AND on unexpectedly-unused source keys).

Marked slow: each family costs a full CPU forward of both frameworks.
"""

import numpy as np
import pytest

from tests.refloader import (
    load_reference_loftr,
    load_reference_sixdreg,
    load_reference_vitess,
    record_loftr_fixture,
    record_sixdreg_fixture,
    record_vitess_fixture,
)

pytestmark = pytest.mark.slow


def _zeros_init(init_fn):
    """Materialize a variables pytree of zeros from an init closure
    without running the real initializers (shapes via eval_shape)."""
    import jax

    shapes = jax.eval_shape(init_fn)
    return jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)


ATOL = 1e-4


class TestFARLoFTRRealParity:
    @pytest.fixture(scope="class")
    def fixture(self):
        model, _ = load_reference_loftr(seed=0)
        return record_loftr_fixture(model, image_hw=(480, 640), seed=0)

    @pytest.fixture(scope="class")
    def cfg(self):
        from far_tpu.utils.config import (
            AttentionStackConfig,
            FARConfig,
            RegressConfig,
        )

        # the production FAR eval config (eval_matterport.sh:17-37)
        return FARConfig(
            image_size=(480, 640),
            coarse=AttentionStackConfig(
                layer_names=("self", "cross") * 3),
            regress=RegressConfig(
                num_loftr_layers=1, use_pos_embedding=True),
            dtype="float32",
        )

    def test_converter_full_coverage(self, fixture, cfg):
        """Every real torch key converts; every model leaf is filled."""
        import jax

        from far_tpu.models.loftr import FARLoFTR
        from far_tpu.types import PairBatch
        from far_tpu.utils.convert_weights import convert_loftr_state_dict

        _, _, sd, _ = fixture
        model = FARLoFTR(cfg)
        H, W = cfg.image_size
        batch = PairBatch(
            image0=np.zeros((1, H, W, 1), np.float32),
            image1=np.zeros((1, H, W, 1), np.float32),
            K0=np.eye(3, dtype=np.float32)[None],
            K1=np.eye(3, dtype=np.float32)[None],
        )
        variables = _zeros_init(
            lambda: FARLoFTR(cfg).init(jax.random.PRNGKey(0), batch))
        _, report = convert_loftr_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:10]
        assert not report["unused"], report["unused"][:10]

    def test_activation_parity(self, fixture, cfg):
        import jax

        from far_tpu.models.loftr import FARLoFTR
        from far_tpu.types import PairBatch
        from far_tpu.utils.parity import run_parity

        H, W = cfg.image_size
        batch = PairBatch(
            image0=np.zeros((1, H, W, 1), np.float32),
            image1=np.zeros((1, H, W, 1), np.float32),
            K0=np.eye(3, dtype=np.float32)[None],
            K1=np.eye(3, dtype=np.float32)[None],
        )
        variables = _zeros_init(
            lambda: FARLoFTR(cfg).init(jax.random.PRNGKey(0), batch))
        result = run_parity(fixture, cfg, variables, atol=ATOL)
        assert not result["skipped"], result
        assert result["ok"], result


class TestViTEssRealParity:
    @pytest.fixture(scope="class")
    def fixture(self):
        model, _ = load_reference_vitess(seed=0)
        return record_vitess_fixture(model, seed=0)

    @pytest.fixture(scope="class")
    def cfg(self):
        from far_tpu.models.vitess import ViTEssConfig

        return ViTEssConfig(dataset="interiornet_T", use_loftr_gating=True,
                            dtype="float32")

    def test_converter_and_activations(self, fixture, cfg):
        import jax
        import jax.numpy as jnp

        from far_tpu.models.vitess import ViTEss
        from far_tpu.utils.parity import run_parity

        images = jnp.zeros((1, 2, 224, 224, 3), jnp.float32)
        sp = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
        nc = jnp.zeros((1,), jnp.float32)
        variables = _zeros_init(
            lambda: ViTEss(cfg).init(jax.random.PRNGKey(0), images, sp, nc,
                                     train=False))
        result = run_parity(fixture, cfg, variables, atol=ATOL)
        assert not result["skipped"], result
        assert result["ok"], result


class TestSixDRegRealParity:
    @pytest.fixture(scope="class")
    def fixture(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("mapfree_cwd")
        model, _ = load_reference_sixdreg(seed=0, tmp_cwd=str(d))
        return record_sixdreg_fixture(model, seed=0)

    @pytest.fixture(scope="class")
    def cfg(self):
        from far_tpu.models.sixdreg import SixDRegConfig

        return SixDRegConfig(dtype="float32")

    def test_converter_and_activations(self, fixture, cfg):
        import jax
        import jax.numpy as jnp

        from far_tpu.models.sixdreg import MapfreeRegression
        from far_tpu.utils.parity import run_parity

        img = jnp.zeros((1, 360, 270, 3), jnp.float32)
        rt = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
        counts = jnp.zeros((1, 3), jnp.float32)
        variables = _zeros_init(
            lambda: MapfreeRegression(cfg).init(
                jax.random.PRNGKey(0), img, img, rt, counts, train=False))
        result = run_parity(fixture, cfg, variables, atol=ATOL)
        assert not result["skipped"], result
        assert result["ok"], result
