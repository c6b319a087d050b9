"""Weight converter tests: build a reference-named state dict shaped for
our small config, convert, and verify every mapped leaf lands. Layout
transforms (conv OIHW->HWIO, in_proj qkv, CHW-flatten permutation) are
additionally verified numerically against real torch modules."""

import numpy as np
import jax
import pytest

from far_tpu.pipeline import init_model
from far_tpu.utils.convert_weights import (
    build_loftr_mapping,
    build_sixdreg_mapping,
    build_vitess_mapping,
    convert_loftr_state_dict,
    convert_sixdreg_state_dict,
    convert_vitess_state_dict,
)
from tests.test_models import small_config


def fake_sd_from_mapping(P, S, variables, rng, prefix=""):
    """Invert a mapping: create torch-shaped tensors for every entry."""
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
                shape = (target.shape[1], target.shape[0]) \
                    if target.ndim == 2 else target.shape
            else:
                shape = target.shape
            val = rng.normal(size=shape).astype(np.float32)
            if torch_key.endswith("running_var"):
                val = np.abs(val) + 0.5  # variances must be positive
            elif val.ndim >= 2:  # fan-in scaling so activations stay finite
                fan_in = int(np.prod(shape[1:]))
                val = val / np.sqrt(fan_in)
            sd[prefix + torch_key] = val
    return sd


def fake_state_dict(cfg, variables, rng):
    P, S = build_loftr_mapping(cfg)
    return fake_sd_from_mapping(P, S, variables, rng, prefix="matcher.")


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


def _init_vitess(cfg, batch_size=1, hw=(64, 64)):
    import jax.numpy as jnp

    from far_tpu.models.vitess import ViTEss

    model = ViTEss(cfg)
    images = jnp.zeros((batch_size, 2, *hw, 3), jnp.float32)
    sp = nc = None
    if cfg.use_loftr_gating:
        sp = jnp.tile(jnp.eye(3, 4)[None], (batch_size, 1, 1))
        nc = jnp.zeros((batch_size,), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, images, sp, nc, train=False)
    )(jax.random.PRNGKey(0))
    return model, variables


def _tiny_vitess_cfg(**kw):
    from far_tpu.models.vitess import ViTEssConfig

    return ViTEssConfig(dim=48, depth=2, num_heads=3, fc_hidden=32,
                        feature_hw=(8, 8), grid_fx=4.0, grid_fy=4.0,
                        dtype="float32", **kw)


class TestViTEssConverter:
    def test_round_trip_fusion_gated(self, rng):
        cfg = _tiny_vitess_cfg(use_loftr_gating=True)
        model, variables = _init_vitess(cfg)
        P, S = build_vitess_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng, prefix="module.")
        out, report = convert_vitess_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]

    def test_round_trip_pooling(self, rng):
        cfg = _tiny_vitess_cfg(fusion_transformer=False, pool_size=12)
        model, variables = _init_vitess(cfg)
        P, S = build_vitess_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        out, report = convert_vitess_state_dict(sd, variables, cfg,
                                                strip_prefix="")
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]

    def test_converted_variables_run(self, rng):
        import jax.numpy as jnp

        cfg = _tiny_vitess_cfg()
        model, variables = _init_vitess(cfg)
        P, S = build_vitess_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng, prefix="module.")
        out, _ = convert_vitess_state_dict(sd, variables, cfg)
        out = jax.tree.map(jnp.asarray, out)
        images = jnp.asarray(rng.uniform(size=(1, 2, 64, 64, 3)),
                             jnp.float32)
        tran, R, pred_9d, gate = model.apply(out, images, None, None,
                                             mutable=False)
        assert np.isfinite(np.asarray(R)).all()

    def test_unused_trunk_tail_tolerated(self, rng):
        cfg = _tiny_vitess_cfg()
        model, variables = _init_vitess(cfg)
        P, S = build_vitess_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng, prefix="module.")
        sd["module.resnet.layer4.0.conv1.weight"] = np.zeros(
            (4, 4, 3, 3), np.float32)
        _, report = convert_vitess_state_dict(sd, variables, cfg)
        assert not report["unused"]


def _tiny_sixdreg_cfg(**kw):
    from far_tpu.models.sixdreg import SixDRegConfig

    kw.setdefault("encoder_blocks", (1, 1, 1))
    kw.setdefault("encoder_out_layers", 8)
    kw.setdefault("transformer_layers", 1)
    kw.setdefault("transformer_heads", 2)
    kw.setdefault("hidden", 32)
    return SixDRegConfig(d_im=256, dtype="float32", **kw)


def _init_sixdreg(cfg, batch_size=1, hw=(64, 64)):
    import jax.numpy as jnp

    from far_tpu.models.sixdreg import MapfreeRegression

    model = MapfreeRegression(cfg)
    img = jnp.zeros((batch_size, *hw, 3), jnp.float32)
    sp = jnp.tile(jnp.eye(3, 4)[None], (batch_size, 1, 1))
    inl = jnp.zeros((batch_size, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, img, img, sp, inl, train=False)
    )(jax.random.PRNGKey(0))
    return model, variables


class TestSixDRegConverter:
    def test_round_trip_bottleneck(self, rng):
        cfg = _tiny_sixdreg_cfg()          # BLOCK_TYPE=1 (bottleneck)
        model, variables = _init_sixdreg(cfg)
        P, S = build_sixdreg_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        out, report = convert_sixdreg_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]

    def test_round_trip_basic_blocks(self, rng):
        cfg = _tiny_sixdreg_cfg(encoder_bottleneck=False)
        model, variables = _init_sixdreg(cfg)
        P, S = build_sixdreg_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        out, report = convert_sixdreg_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]

    def test_frozen_matcher_tolerated(self, rng):
        cfg = _tiny_sixdreg_cfg()
        model, variables = _init_sixdreg(cfg)
        P, S = build_sixdreg_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        sd["matcher.backbone.conv1.weight"] = np.zeros((4, 1, 7, 7),
                                                       np.float32)
        sd["s_r"] = np.zeros((1,), np.float32)
        _, report = convert_sixdreg_state_dict(sd, variables, cfg)
        assert not report["unused"]

    def test_converted_variables_run(self, rng):
        import jax.numpy as jnp

        cfg = _tiny_sixdreg_cfg()
        model, variables = _init_sixdreg(cfg)
        P, S = build_sixdreg_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        out, _ = convert_sixdreg_state_dict(sd, variables, cfg)
        out = jax.tree.map(jnp.asarray, out)
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        sp = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
        inl = jnp.ones((1, 3), jnp.float32)
        R, t, pred_9d, gate = model.apply(out, img, img, sp, inl,
                                          mutable=False)
        assert np.isfinite(np.asarray(R)).all()


torch = pytest.importorskip("torch")


class TestTorchNumericParity:
    """Verify the layout transforms against real torch semantics (the
    plumbing round trips above cannot catch a wrong permutation)."""

    def test_conv_bn_stride2(self, rng):
        import flax.linen as fnn
        import jax.numpy as jnp

        tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        tbn = torch.nn.BatchNorm2d(8).eval()
        with torch.no_grad():
            tbn.running_mean.normal_()
            tbn.running_var.uniform_(0.5, 1.5)
            tbn.weight.normal_()
            tbn.bias.normal_()
        x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            y_t = tbn(tconv(torch.from_numpy(x))).numpy()

        class M(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                x = fnn.Conv(8, (3, 3), (2, 2), padding=1,
                             use_bias=False, name="conv")(x)
                return fnn.BatchNorm(use_running_average=True,
                                     name="bn")(x)

        m = M()
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(
            x.transpose(0, 2, 3, 1)))
        params = jax.device_get(v["params"])
        stats = jax.device_get(v["batch_stats"])
        params["conv"]["kernel"] = np.transpose(
            tconv.weight.detach().numpy(), (2, 3, 1, 0))
        params["bn"]["scale"] = tbn.weight.detach().numpy()
        params["bn"]["bias"] = tbn.bias.detach().numpy()
        stats["bn"]["mean"] = tbn.running_mean.numpy()
        stats["bn"]["var"] = tbn.running_var.numpy()
        y = m.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), y_t, atol=2e-5)

    def test_transformer_encoder_layer(self, rng):
        import jax.numpy as jnp

        from far_tpu.models.sixdreg import TorchTransformerEncoderLayer

        C, h, ff = 32, 4, 64
        tl = torch.nn.TransformerEncoderLayer(
            d_model=C, nhead=h, dim_feedforward=ff, dropout=0.0,
            batch_first=True).eval()
        x = rng.normal(size=(2, 5, C)).astype(np.float32)
        with torch.no_grad():
            y_t = tl(torch.from_numpy(x)).numpy()

        ours = TorchTransformerEncoderLayer(C, h, dim_ff=ff)
        v = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
        p = jax.device_get(v["params"])
        sd = {k: t.detach().numpy() for k, t in tl.state_dict().items()}
        p["qkv"]["kernel"] = sd["self_attn.in_proj_weight"].T
        p["qkv"]["bias"] = sd["self_attn.in_proj_bias"]
        p["proj"]["kernel"] = sd["self_attn.out_proj.weight"].T
        p["proj"]["bias"] = sd["self_attn.out_proj.bias"]
        p["ff1"]["kernel"] = sd["linear1.weight"].T
        p["ff1"]["bias"] = sd["linear1.bias"]
        p["ff2"]["kernel"] = sd["linear2.weight"].T
        p["ff2"]["bias"] = sd["linear2.bias"]
        for n in ("norm1", "norm2"):
            p[n]["scale"] = sd[f"{n}.weight"]
            p[n]["bias"] = sd[f"{n}.bias"]
        y = ours.apply({"params": p}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), y_t, atol=2e-5)

    def test_chw_flatten_permutation(self, rng):
        from far_tpu.utils.convert_weights import _perm_linear

        C, H, W, out = 6, 4, 5, 7
        lin = torch.nn.Linear(C * H * W + 3, out)
        x = rng.normal(size=(2, C, H, W)).astype(np.float32)
        extra = rng.normal(size=(2, 3)).astype(np.float32)
        with torch.no_grad():
            y_t = lin(torch.cat([
                torch.from_numpy(x).reshape(2, -1),
                torch.from_numpy(extra)], -1)).numpy()

        w = _perm_linear(C, n_extra=3)(lin.weight)
        feats = np.concatenate(
            [x.transpose(0, 2, 3, 1).reshape(2, -1), extra], -1)
        y = feats @ w + lin.bias.detach().numpy()
        np.testing.assert_allclose(y, y_t, atol=1e-5)

    def test_chw_flatten_two_blocks(self, rng):
        from far_tpu.utils.convert_weights import _perm_linear

        C, H, W, out = 3, 2, 2, 4
        lin = torch.nn.Linear(2 * C * H * W, out, bias=False)
        x = rng.normal(size=(2, 2, C, H, W)).astype(np.float32)  # (B, img)
        with torch.no_grad():
            y_t = lin(torch.from_numpy(x).reshape(2, -1)).numpy()
        w = _perm_linear(C, n_blocks=2)(lin.weight)
        feats = x.transpose(0, 1, 3, 4, 2).reshape(2, -1)  # img-major HWC
        np.testing.assert_allclose(feats @ w, y_t, atol=1e-5)


class TestSuperPointGlueConverter:
    def _sg_fake_sd(self, cfg, rng):
        D = cfg.desc_dim
        widths = [3, 32, 64, 128, 256, D]
        sd = {}

        def conv1d(name, cout, cin):
            sd[f"{name}.weight"] = rng.normal(
                size=(cout, cin, 1)).astype(np.float32) / np.sqrt(cin)
            sd[f"{name}.bias"] = rng.normal(size=(cout,)).astype(np.float32)

        def bn(name, c):
            sd[f"{name}.weight"] = np.abs(
                rng.normal(size=(c,))).astype(np.float32) + 0.5
            sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)
            sd[f"{name}.running_mean"] = rng.normal(
                size=(c,)).astype(np.float32)
            sd[f"{name}.running_var"] = np.abs(
                rng.normal(size=(c,))).astype(np.float32) + 0.5

        for i in range(4):
            conv1d(f"kenc.encoder.{3 * i}", widths[i + 1], widths[i])
            bn(f"kenc.encoder.{3 * i + 1}", widths[i + 1])
        conv1d("kenc.encoder.12", D, 256)
        for i in range(2 * cfg.num_layers):
            src = f"gnn.layers.{i}"
            for j in range(3):
                conv1d(f"{src}.attn.proj.{j}", D, D)
            conv1d(f"{src}.attn.merge", D, D)
            conv1d(f"{src}.mlp.0", 2 * D, 2 * D)
            bn(f"{src}.mlp.1", 2 * D)
            conv1d(f"{src}.mlp.3", D, 2 * D)
        conv1d("final_proj", D, D)
        sd["bin_score"] = np.asarray(1.0, np.float32)
        return sd

    def test_superpoint_round_trip(self, rng):
        import jax.numpy as jnp

        from far_tpu.models.superpoint import (
            SuperPointConfig,
            SuperPointTPU,
        )
        from far_tpu.utils.convert_weights import (
            build_superpoint_mapping,
            convert_superpoint_state_dict,
        )

        cfg = SuperPointConfig(max_keypoints=16)
        model = SuperPointTPU(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 1)))
        P, S = build_superpoint_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        out, report = convert_superpoint_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]
        k, s, v, d = model.apply(
            jax.tree.map(jnp.asarray, out), jnp.ones((1, 32, 32, 1)) * 0.5)
        assert np.isfinite(np.asarray(d)).all()

    def test_superglue_round_trip_and_bn_fold(self, rng):
        import jax.numpy as jnp

        from far_tpu.models.superglue import SuperGlueConfig, SuperGlueTPU
        from far_tpu.utils.convert_weights import (
            convert_superglue_state_dict,
        )

        cfg = SuperGlueConfig(desc_dim=64, num_layers=2,
                              sinkhorn_iterations=5)
        model = SuperGlueTPU(cfg)
        K = 8
        args = (jnp.zeros((1, K, 2)), jnp.zeros((1, K)),
                jnp.ones((1, K), bool), jnp.zeros((1, K, cfg.desc_dim)))
        variables = model.init(jax.random.PRNGKey(0), *args, *args,
                               image_hw=(32, 32))
        sd = self._sg_fake_sd(cfg, rng)
        out, report = convert_superglue_state_dict(sd, variables, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]

        # numeric BN-fold check: torch Conv1d+BN (eval) == folded Dense
        torch = pytest.importorskip("torch")
        conv = torch.nn.Conv1d(3, 32, 1)
        bnm = torch.nn.BatchNorm1d(32)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(sd["kenc.encoder.0.weight"]))
            conv.bias.copy_(torch.from_numpy(sd["kenc.encoder.0.bias"]))
            bnm.weight.copy_(torch.from_numpy(sd["kenc.encoder.1.weight"]))
            bnm.bias.copy_(torch.from_numpy(sd["kenc.encoder.1.bias"]))
            bnm.running_mean.copy_(
                torch.from_numpy(sd["kenc.encoder.1.running_mean"]))
            bnm.running_var.copy_(
                torch.from_numpy(sd["kenc.encoder.1.running_var"]))
        bnm.eval()
        x = rng.normal(size=(1, 3, 7)).astype(np.float32)
        with torch.no_grad():
            ref = bnm(conv(torch.from_numpy(x))).numpy()[0].T  # (7, 32)
        kern = np.asarray(out["params"]["kenc_0"]["kernel"])
        bias = np.asarray(out["params"]["kenc_0"]["bias"])
        ours = x[0].T @ kern + bias
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

        # shared final_proj fills both heads
        np.testing.assert_allclose(
            np.asarray(out["params"]["final_proj"]["kernel"]),
            np.asarray(out["params"]["final_proj2"]["kernel"]))

        # the converted tree runs
        m0, conf = model.apply(
            jax.tree.map(jnp.asarray, out),
            jnp.asarray(rng.normal(size=(1, K, 2)), jnp.float32) * 4 + 16,
            jnp.ones((1, K)) * 0.5, jnp.ones((1, K), bool),
            jnp.asarray(rng.normal(size=(1, K, cfg.desc_dim)),
                        jnp.float32),
            jnp.asarray(rng.normal(size=(1, K, 2)), jnp.float32) * 4 + 16,
            jnp.ones((1, K)) * 0.5, jnp.ones((1, K), bool),
            jnp.asarray(rng.normal(size=(1, K, cfg.desc_dim)),
                        jnp.float32),
            image_hw=(32, 32))
        assert m0.shape == (1, K)
