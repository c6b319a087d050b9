"""Checkpoint save/restore, auto-resume, and curriculum surgery tests."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.train.checkpoint import (
    MATTERPORT_CURRICULUM,
    CheckpointManager,
    CurriculumPhase,
    apply_phase,
    surgical_load,
)
from far_tpu.utils.config import FARConfig


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.asarray(7)}
        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save(7, state)
        assert mgr.latest_step() == 7
        template = jax.tree.map(jnp.zeros_like, state)
        restored = mgr.restore(template)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]),
            np.arange(6.0).reshape(2, 3))
        mgr.close()

    def test_auto_resume_latest(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpt")
        for step in (1, 5, 3):
            mgr.save(step, {"x": jnp.asarray(float(step))})
        assert mgr.latest_step() == 5
        out = mgr.restore({"x": jnp.asarray(0.0)})
        assert float(out["x"]) == 5.0
        mgr.close()

    def test_retention(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        for step in range(5):
            mgr.save(step, {"x": jnp.asarray(float(step))})
        assert mgr.latest_step() == 4
        mgr.close()


class TestSurgery:
    def test_shape_mismatch_reinitialized(self):
        restored = {"a": np.ones((3, 3)), "moe": np.ones((10, 2))}
        template = {"a": np.zeros((3, 3)), "moe": np.zeros((12, 2))}
        merged, skipped = surgical_load(restored, template, verbose=False)
        np.testing.assert_array_equal(merged["a"], np.ones((3, 3)))
        np.testing.assert_array_equal(merged["moe"], np.zeros((12, 2)))
        assert len(skipped) == 1

    def test_missing_leaf_kept_from_template(self):
        restored = {"a": np.ones((2,))}
        template = {"a": np.zeros((2,)), "new_head": np.full((4,), 7.0)}
        merged, skipped = surgical_load(restored, template, verbose=False)
        np.testing.assert_array_equal(merged["new_head"], np.full((4,), 7.0))
        assert skipped == ["['new_head']"]


class TestCurriculum:
    def test_phases_shape_config(self):
        cfg = FARConfig()
        p0 = apply_phase(cfg, MATTERPORT_CURRICULUM[0])
        assert not p0.regress_rt
        p3 = apply_phase(cfg, MATTERPORT_CURRICULUM[3])
        assert p3.regress_rt and p3.regress.use_simple_moe
        assert p3.solver.solver == "prior_ransac"


class TestPresets:
    def test_all_presets_construct(self):
        from far_tpu.configs import PRESETS

        for name, fn in PRESETS.items():
            p = fn()
            assert p.batch_size > 0
            assert len(p.curriculum) >= 1
        # matterport curriculum phases map onto valid configs
        from far_tpu.train.checkpoint import apply_phase
        from far_tpu.configs import matterport

        mp = matterport()
        for phase in mp.curriculum:
            cfg = apply_phase(mp.model, phase)
            assert cfg.solver.solver in (
                "ransac", "prior_ransac", "prior_ransac_noprior")
