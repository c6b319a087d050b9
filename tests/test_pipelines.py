"""End-to-end pipeline tests: map-free loop, profiler, logging, comm."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.models.sixdreg import MapfreeRegression, SixDRegConfig
from far_tpu.pipeline import init_model, mapfree_forward
from tests.test_models import make_batch, small_config


import pytest

pytestmark = pytest.mark.slow


class TestMapfreePipeline:
    def test_two_round_loop(self, rng):
        cfg = small_config()
        matcher, m_vars = init_model(cfg, seed=0, batch_size=2)

        rcfg = SixDRegConfig(
            image_hw=(32, 32), encoder_blocks=(1, 1, 1),
            encoder_out_layers=8, transformer_layers=1,
            transformer_heads=4, hidden=32, dtype="float32",
        )
        reg = MapfreeRegression(rcfg)
        im0 = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
        im1 = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
        rt = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
        r_vars = reg.init(jax.random.PRNGKey(1), im0, im1, rt,
                          jnp.ones((2, 3)))

        batch = make_batch(rng, cfg)
        R, t, gate, est = jax.jit(
            lambda mv, rv, b, i0, i1, k: mapfree_forward(
                matcher, mv, reg, rv, b, i0, i1, k)
        )(m_vars, r_vars, batch, im0, im1, jax.random.PRNGKey(2))
        assert R.shape == (2, 3, 3)
        assert np.isfinite(np.asarray(R)).all()
        assert np.isfinite(np.asarray(t)).all()
        RRt = np.asarray(jnp.matmul(R, jnp.swapaxes(R, -1, -2)))
        np.testing.assert_allclose(RRt, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-3)


class TestAux:
    def test_inference_profiler(self):
        from far_tpu.utils.prof import InferenceProfiler, build_profiler

        prof = InferenceProfiler()
        with prof.profile("region"):
            jnp.ones((8, 8)).sum().block_until_ready()
        assert prof.times["region"] > 0
        assert "region" in prof.summary()
        assert build_profiler(None).summary() == "(profiling disabled)"

    def test_metric_logger(self, tmp_path):
        import json

        from far_tpu.utils.logging import MetricLogger

        lg = MetricLogger(tmp_path, print_every=0)
        lg.log(0, {"loss": 1.5})
        lg.log(1, {"loss": jnp.asarray(0.5)})
        lg.close()
        lines = [json.loads(x) for x in
                 (tmp_path / "train_metrics.jsonl").read_text().splitlines()]
        assert lines[0]["loss"] == 1.5 and lines[1]["loss"] == 0.5

    def test_comm_single_process(self):
        from far_tpu.parallel.comm import all_gather_metrics, local_mesh

        m = all_gather_metrics({"a": np.arange(4.0)})
        np.testing.assert_array_equal(m["a"], np.arange(4.0))
        mesh = local_mesh()
        assert mesh.devices.size == 8


class TestViTEssPipeline:
    def test_gated_inference(self, rng):
        import dataclasses

        from far_tpu.models.vitess import ViTEss, ViTEssConfig
        from far_tpu.pipeline import init_model, vitess_forward

        mcfg = small_config()
        matcher, m_vars = init_model(mcfg, seed=0, batch_size=1)
        batch = make_batch(rng, mcfg, B=1)

        vcfg = ViTEssConfig(dim=48, depth=2, num_heads=3, fc_hidden=64,
                            use_loftr_gating=True, dtype="float32")
        vit = ViTEss(vcfg)
        imgs = jnp.asarray(rng.uniform(size=(1, 2, 96, 96, 3)), jnp.float32)
        v_vars = vit.init(jax.random.PRNGKey(3), imgs,
                          jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1)),
                          jnp.ones((1,)))
        tran, R, pose9, gate = vitess_forward(
            vit, v_vars, imgs, matcher, m_vars, batch,
            jax.random.PRNGKey(4))
        assert gate.shape == (1, 2)
        assert np.isfinite(np.asarray(tran)).all()
        RRt = np.asarray(R[0] @ R[0].T)
        np.testing.assert_allclose(RRt, np.eye(3), atol=1e-3)
