"""Weight converter tests: build a reference-named state dict shaped for
our small config, convert, and verify every mapped leaf lands."""

import numpy as np
import jax
import pytest

from far_tpu.pipeline import init_model
from far_tpu.utils.convert_weights import (
    build_loftr_mapping,
    convert_loftr_state_dict,
)
from tests.test_models import small_config


def fake_state_dict(cfg, variables, rng):
    """Invert the mapping: create torch-shaped tensors for every entry."""
    P, S = build_loftr_mapping(cfg)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return np.asarray(node)

    sd = {}
    for entries, tree in ((P, params), (S, stats)):
        for torch_key, path, tf in entries:
            target = get(tree, path)
            if tf.__name__ == "_conv":
                shape = (target.shape[3], target.shape[2],
                         target.shape[0], target.shape[1])
            elif tf.__name__ == "_linear":
                shape = (target.shape[1], target.shape[0])
            else:
                shape = target.shape
            val = rng.normal(size=shape).astype(np.float32)
            if torch_key.endswith("running_var"):
                val = np.abs(val) + 0.5  # variances must be positive
            elif val.ndim >= 2:  # fan-in scaling so activations stay finite
                fan_in = int(np.prod(shape[1:]))
                val = val / np.sqrt(fan_in)
            sd["matcher." + torch_key] = val
    return sd


class TestConverter:
    def test_full_round_trip(self, rng):
        cfg = small_config()
        model, variables = init_model(cfg, seed=0, batch_size=1)
        sd = fake_state_dict(cfg, variables, rng)
        out, report = convert_loftr_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]
        assert len(report["converted"]) == len(sd)

    def test_layout_transforms(self, rng):
        cfg = small_config()
        model, variables = init_model(cfg, seed=0, batch_size=1)
        sd = fake_state_dict(cfg, variables, rng)
        out, _ = convert_loftr_state_dict(sd, variables, cfg)
        # conv: OIHW -> HWIO round trip
        w = sd["matcher.backbone.conv1.weight"]
        k = np.asarray(out["params"]["backbone"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(k, np.transpose(w, (2, 3, 1, 0)))
        # linear transpose
        lw = sd["matcher.loftr_coarse.layers.0.q_proj.weight"]
        lk = np.asarray(
            out["params"]["loftr_coarse"]["layer_0_self"]["q_proj"]["kernel"])
        np.testing.assert_allclose(lk, lw.T)
        # bn running stats land in batch_stats
        rm = sd["matcher.backbone.bn1.running_mean"]
        bs = np.asarray(
            out["batch_stats"]["backbone"]["_Norm_0"]["BatchNorm_0"]["mean"])
        np.testing.assert_allclose(bs, rm)

    def test_converted_variables_run(self, rng):
        """The converted tree must be drop-in usable by the model."""
        import jax.numpy as jnp

        from tests.test_models import make_batch

        cfg = small_config()
        model, variables = init_model(cfg, seed=0, batch_size=1)
        sd = fake_state_dict(cfg, variables, rng)
        out, _ = convert_loftr_state_dict(sd, variables, cfg)
        out = jax.tree.map(jnp.asarray, out)
        batch = make_batch(rng, cfg, B=1)
        res = model.apply(out, batch, method="match", mutable=False)
        assert np.isfinite(np.asarray(res.feat_c0, np.float32)).all()

    def test_shape_mismatch_raises(self, rng):
        cfg = small_config()
        model, variables = init_model(cfg, seed=0, batch_size=1)
        sd = fake_state_dict(cfg, variables, rng)
        sd["matcher.backbone.conv1.weight"] = np.zeros((7, 7, 7, 7),
                                                       np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            convert_loftr_state_dict(sd, variables, cfg)
