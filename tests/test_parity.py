"""Parity-harness tests: self-consistent fixtures (taps recorded from
our own converted model, saved in torch layouts) must replay with ~zero
error — validating fixture IO, in-harness conversion, intermediate
extraction, and layout alignment. The torch recorder is exercised on a
plain torch module."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from far_tpu.utils.convert_weights import (
    build_sixdreg_mapping,
    build_vitess_mapping,
    convert_sixdreg_state_dict,
    convert_vitess_state_dict,
)
from far_tpu.utils.parity import (
    SIXDREG_TAPS,
    VITESS_TAPS,
    Tap,
    load_fixture,
    run_parity,
)
from tests.test_convert import (
    _init_sixdreg,
    _init_vitess,
    _tiny_sixdreg_cfg,
    _tiny_vitess_cfg,
    fake_sd_from_mapping,
)


def _save_fixture(path, family, inputs, sd, taps):
    arrays = {f"input.{k}": np.asarray(v) for k, v in inputs.items()}
    arrays.update({f"sd.{k}": np.asarray(v) for k, v in sd.items()})
    arrays.update({f"tap.{k}": np.asarray(v) for k, v in taps.items()})
    arrays["meta"] = np.asarray(
        json.dumps({"family": family, "taps": sorted(taps)}))
    np.savez_compressed(path, **arrays)


class TestVitessParity:
    def test_self_fixture_zero_error(self, rng, tmp_path):
        cfg = _tiny_vitess_cfg()
        model, variables = _init_vitess(cfg)
        P, S = build_vitess_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        converted, _ = convert_vitess_state_dict(sd, variables, cfg,
                                                 strip_prefix="")

        rgb = rng.uniform(size=(1, 2, 32, 32, 3)).astype(np.float32)
        out, state = model.apply(
            jax.tree.map(jnp.asarray, converted), jnp.asarray(rgb),
            None, None, train=False,
            capture_intermediates=True, mutable=["intermediates"])
        inters = state["intermediates"]

        taps = {}
        # output-level taps (flax_path None) need a real torch forward —
        # the self-fixture covers the intermediate taps only; the real
        # recorder path is tests/test_real_parity.py
        for tap in VITESS_TAPS:
            node, found = inters, tap.flax_path is not None
            for k in (tap.flax_path or ()):
                if k not in node:
                    found = False
                    break
                node = node[k]
            if not found:
                continue
            ours = np.asarray(node["__call__"][tap.call], np.float32)
            if tap.layout == "nchw":   # store in torch layout
                taps[tap.name] = ours.transpose(0, 3, 1, 2)
            elif tap.layout == "reshape":
                B, twoDv, C = ours.shape
                taps[tap.name] = ours.reshape(2 * B, twoDv // 2, C)
            else:
                taps[tap.name] = ours

        # reference-layout input: (B, 2, 3, H, W) BGR in [0, 255]
        images_torch = (rgb[..., ::-1] * 255.0).transpose(0, 1, 4, 2, 3)
        fixture = tmp_path / "vitess_fixture.npz"
        _save_fixture(fixture, "vitess", {"images": images_torch}, sd,
                      taps)

        rep = run_parity(str(fixture), cfg, variables, atol=1e-3)
        assert rep["ok"], rep
        assert set(rep["taps"]) == {t.name for t in VITESS_TAPS
                                    if t.flax_path is not None}
        assert max(rep["taps"].values()) < 1e-4, rep


class TestSixdregParity:
    def test_self_fixture_zero_error(self, rng, tmp_path):
        cfg = _tiny_sixdreg_cfg()
        model, variables = _init_sixdreg(cfg)
        P, S = build_sixdreg_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        converted, _ = convert_sixdreg_state_dict(sd, variables, cfg)

        img0 = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        img1 = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        sp = np.tile(np.eye(3, 4, dtype=np.float32)[None], (1, 1, 1))
        inl = np.ones((1, 3), np.float32)
        out, state = model.apply(
            jax.tree.map(jnp.asarray, converted), jnp.asarray(img0),
            jnp.asarray(img1), jnp.asarray(sp), jnp.asarray(inl),
            train=False, capture_intermediates=True,
            mutable=["intermediates"])
        inters = state["intermediates"]

        taps = {}
        # skip output taps (no flax_path) and taps of modules the tiny
        # cfg doesn't build (e.g. transformer_5) — see the vitess note
        for tap in SIXDREG_TAPS:
            node, found = inters, tap.flax_path is not None
            for k in (tap.flax_path or ()):
                if k not in node:
                    found = False
                    break
                node = node[k]
            if not found:
                continue
            ours = node["__call__"][tap.call]
            if tap.elem is not None:
                ours = ours[tap.elem]
            ours = np.asarray(ours, np.float32)
            if tap.layout == "nchw":
                ours = ours.transpose(0, 3, 1, 2)
            elif tap.layout == "ncl":
                ours = ours.transpose(0, 2, 1)
            taps[tap.name] = ours

        fixture = tmp_path / "sixdreg_fixture.npz"
        _save_fixture(
            fixture, "sixdreg",
            {"image0_reg": img0.transpose(0, 3, 1, 2),
             "image1_reg": img1.transpose(0, 3, 1, 2),
             "solver_rt": sp, "solver_inliers": inl},
            sd, taps)

        rep = run_parity(str(fixture), cfg, variables, atol=1e-3)
        assert rep["ok"], rep
        assert max(rep["taps"].values()) < 1e-4, rep

    def test_missing_key_raises(self, rng, tmp_path):
        cfg = _tiny_sixdreg_cfg()
        model, variables = _init_sixdreg(cfg)
        P, S = build_sixdreg_mapping(cfg)
        sd = fake_sd_from_mapping(P, S, variables, rng)
        sd.pop("encoder.firstconv.weight")
        fixture = tmp_path / "bad.npz"
        _save_fixture(fixture, "sixdreg",
                      {"image0_reg": np.zeros((1, 3, 64, 64), np.float32),
                       "image1_reg": np.zeros((1, 3, 64, 64), np.float32)},
                      sd, {})
        with pytest.raises(ValueError, match="missing mapped keys"):
            run_parity(str(fixture), cfg, variables)


class TestTorchRecorder:
    def test_record_fixture_from_torch_module(self, tmp_path, rng):
        torch = pytest.importorskip("torch")

        from far_tpu.utils.parity import record_torch_fixture

        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = torch.nn.Conv2d(3, 4, 3, padding=1)
                self.head = torch.nn.Linear(4, 2)

            def forward(self, x):
                y = self.conv(x)
                return self.head(y.mean((2, 3)))

        net = Net().eval()
        taps = [Tap("conv", "conv", ("conv",), layout="nchw")]
        x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
        record_torch_fixture(
            net, taps, {"x": x},
            lambda m, inp: m(inp["x"]),
            str(tmp_path / "f.npz"), family="vitess")

        meta, inputs, sd, recorded = load_fixture(str(tmp_path / "f.npz"))
        assert meta["family"] == "vitess"
        assert "conv.weight" in sd and "head.bias" in sd
        np.testing.assert_allclose(inputs["x"], x)
        with torch.no_grad():
            expected = net.conv(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(recorded["conv"], expected, atol=1e-6)
