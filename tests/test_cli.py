"""CLI smoke tests on synthetic data (tiny configs, few steps)."""

import numpy as np
import pytest


_SMALL_SETS = [
    "backbone.initial_dim=16", "backbone.block_dims=16,24,32",
    "coarse.d_model=32", "coarse.nhead=4",
    "match.max_matches=32", "match.thr=0.0",
    "fine.d_model=16", "fine.nhead=4",
    "regress.d_model=32", "regress.emm_heads=4", "regress.hidden=64",
    "solver.num_hypotheses=64",
]
# batch 8 = one pair per virtual device on the test mesh
SMALL = [
    "--dataset", "synthetic", "--image_size", "64x64",
    "--n_synthetic", "8", "--batch_size", "8", "--dtype", "float32",
]
for _s in _SMALL_SETS:
    SMALL += ["--set", _s]


pytestmark = pytest.mark.slow


class TestTrainCLI:
    def test_train_few_steps(self, tmp_path):
        from far_tpu.cli.train import main

        main(SMALL + [
            "--steps", "2", "--log_every", "1",
            "--ckpt_dir", str(tmp_path / "ckpt"),
            "--log_dir", str(tmp_path / "logs"),
            "--sampler", "sequential",
        ])
        assert (tmp_path / "logs" / "train_metrics.jsonl").exists()

    def test_train_debug_nans(self, tmp_path):
        """--debug_nans (reference set_detect_anomaly equivalent,
        mapfree_6dreg/train.py:22) must train cleanly on finite data
        and leave the flag reset afterwards."""
        import jax

        from far_tpu.cli.train import main

        try:
            main(SMALL + [
                "--steps", "1", "--log_every", "1", "--debug_nans",
                "--ckpt_dir", str(tmp_path / "ckpt"),
                "--log_dir", str(tmp_path / "logs"),
                "--sampler", "sequential",
            ])
            assert jax.config.jax_debug_nans
        finally:
            jax.config.update("jax_debug_nans", False)

    def test_train_resume(self, tmp_path):
        from far_tpu.cli.train import main

        argv = SMALL + [
            "--steps", "1", "--log_every", "1",
            "--ckpt_dir", str(tmp_path / "ckpt"),
            "--log_dir", str(tmp_path / "logs"),
            "--sampler", "sequential",
        ]
        main(argv)
        main(argv + ["--resume"])  # resumes at step 1 -> no more steps


class TestEvaluateCLI:
    def test_evaluate_table(self, tmp_path):
        from far_tpu.cli.evaluate import main

        table = main(SMALL + [
            "--max_batches", "1",
            "--out_dir", str(tmp_path / "eval"),
        ])
        assert "rot mean err" in table
        assert (tmp_path / "eval" / "pred_R.npy").exists()
        cdf = np.load(tmp_path / "eval" / "error_cdf.npy")
        assert (np.diff(cdf) >= 0).all()

    def test_intrinsics_guard(self):
        """Mismatched focals must raise (VERDICT r2 weak #5): the
        epipolar basis is built from RegressConfig.grid_fx/grid_fy, so
        a batch whose fx/cx ratio deviates from those constants would
        silently corrupt EMM features."""
        from types import SimpleNamespace

        from far_tpu.cli.evaluate import _check_batch_intrinsics
        from far_tpu.utils.config import FARConfig

        cfg = FARConfig(image_size=(480, 640), dtype="float32")

        def batch_with(f):
            K = np.array([[[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]]],
                         np.float32)
            return SimpleNamespace(K0=K, K1=K.copy())

        # Matterport camera (fx=fy=517, the basis constants' origin)
        _check_batch_intrinsics(batch_with(517.0), cfg)
        # a genuinely different camera must raise
        with pytest.raises(ValueError, match="basis constants"):
            _check_batch_intrinsics(batch_with(320.0), cfg)
        # differing K0/K1 must raise regardless
        b = batch_with(517.0)
        b.K1[0, 0, 0] *= 2.0
        with pytest.raises(ValueError, match="differ between frames"):
            _check_batch_intrinsics(b, cfg)


class TestViTEssEvaluateCLI:
    VITESS_SMALL = [
        "--model", "vitess", "--dataset", "synthetic",
        "--image_size", "64x64", "--n_synthetic", "8",
        "--batch_size", "8", "--dtype", "float32",
        "--set", "dim=48", "--set", "depth=2", "--set", "fc_hidden=64",
        "--set", "feature_hw=8,8", "--set", "grid_fx=4.0",
        "--set", "grid_fy=4.0",
    ]

    def test_vitess_eval_table(self, tmp_path):
        from far_tpu.cli.evaluate import main

        table = main(self.VITESS_SMALL + [
            "--out_dir", str(tmp_path / "eval")])
        assert "large overlap, rot mean err" in table
        assert (tmp_path / "eval" / "results.txt").exists()
        assert np.load(tmp_path / "eval" / "pred_R.npy").shape == (8, 3, 3)

    def test_vitess_eval_gated(self, tmp_path):
        from far_tpu.cli.evaluate import main

        table = main(self.VITESS_SMALL + [
            "--set", "use_loftr_gating=true",
            "--out_dir", str(tmp_path / "eval")])
        assert "small overlap, rot median err" in table

    def test_vitess_train_then_eval_restores_ckpt(self, tmp_path):
        from far_tpu.cli.evaluate import main as eval_main
        from far_tpu.cli.train import main as train_main

        common = self.VITESS_SMALL
        train_main(common + [
            "--steps", "1", "--log_every", "1", "--sampler", "sequential",
            "--ckpt_dir", str(tmp_path / "ckpt"),
            "--log_dir", str(tmp_path / "logs"),
        ])
        table = eval_main(common + [
            "--ckpt_dir", str(tmp_path / "ckpt"),
            "--out_dir", str(tmp_path / "eval")])
        assert "large overlap, rot mean err" in table


class TestFAREvaluateCkptRestore:
    def test_far_train_then_eval_restores_ckpt(self, tmp_path):
        """The checkpoint stores a full TrainState; eval must pull the
        params/batch_stats subtree out of it (restore_raw path)."""
        from far_tpu.cli.evaluate import main as eval_main
        from far_tpu.cli.train import main as train_main

        train_main(SMALL + [
            "--steps", "1", "--log_every", "1", "--sampler", "sequential",
            "--ckpt_dir", str(tmp_path / "ckpt"),
            "--log_dir", str(tmp_path / "logs"),
        ])
        table = eval_main(SMALL + [
            "--max_batches", "1",
            "--ckpt_dir", str(tmp_path / "ckpt"),
            "--out_dir", str(tmp_path / "eval")])
        assert "rot mean err" in table


class TestDemoCLI:
    def test_demo_synthetic(self):
        from far_tpu.cli.demo import main

        argv = ["--synthetic", "--image_size", "64x64",
                "--dtype", "float32"]
        for s in _SMALL_SETS:
            argv += ["--set", s]
        rt = main(argv)
        assert rt.shape == (3, 4)
        assert np.isfinite(rt).all()


class TestPrecomputeCLI:
    def test_precompute_sift(self, tmp_path):
        from far_tpu.cli.precompute import main

        out = tmp_path / "corr.npz"
        main(["--dataset", "synthetic", "--image_size", "64x64",
              "--n_synthetic", "2", "--matcher", "sift",
              "--out", str(out), "--dtype", "float32"])
        z = np.load(out)
        assert len(z.files) == 2

    def test_precompute_loftr(self, tmp_path):
        from far_tpu.cli.precompute import main

        out = tmp_path / "corr_l.npz"
        argv = ["--dataset", "synthetic", "--image_size", "64x64",
                "--n_synthetic", "1", "--matcher", "loftr",
                "--out", str(out), "--dtype", "float32"]
        for s in _SMALL_SETS:
            argv += ["--set", s]
        main(argv)
        assert np.load(out).files


class TestMapfreeDemo:
    def test_demo_mapfree_synthetic(self):
        from far_tpu.cli.demo import main

        argv = ["--synthetic", "--mapfree", "--image_size", "64x64",
                "--reg_size", "32x32", "--dtype", "float32"]
        for s in _SMALL_SETS:
            argv += ["--set", s]
        rt = main(argv)
        assert rt.shape == (3, 4)
        assert np.isfinite(rt).all()
