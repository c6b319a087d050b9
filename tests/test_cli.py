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
