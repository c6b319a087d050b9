"""End-to-end quality signals: solver accuracy on rendered scenes and
training convergence (the 'does it actually learn' smoke)."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.data import SyntheticPairDataset
from far_tpu.geometry import geodesic_distance, warp_kpts
from far_tpu.solvers import SolverConfig, estimate_pose


import pytest

pytestmark = pytest.mark.slow


class TestSolverOnRenderedScenes:
    def test_oracle_matches_recover_pose(self):
        """GT-warped correspondences from rendered depth -> the full
        on-device solver recovers the true pose to ~1 degree."""
        ds = SyntheticPairDataset(n=4, hw=(240, 320))
        errs = []
        for i in range(4):
            s = ds[i]
            ys, xs = np.where(s["depth0"] > 0)
            sel = np.linspace(0, len(xs) - 1, 512).astype(int)
            pts0 = np.stack([xs[sel], ys[sel]], -1).astype(np.float32)
            T = s["T_0to1"]
            valid, w = warp_kpts(
                jnp.asarray(pts0)[None], jnp.asarray(s["depth0"])[None],
                jnp.asarray(s["depth1"])[None], jnp.asarray(T[:3])[None],
                jnp.asarray(s["K0"])[None], jnp.asarray(s["K1"])[None],
            )
            est = estimate_pose(
                jax.random.PRNGKey(i),
                jnp.asarray(pts0)[None], w, jnp.asarray(s["K0"])[None],
                jnp.asarray(s["K1"])[None], valid,
                cfg=SolverConfig(solver="prior_ransac_noprior",
                                 num_hypotheses=512, prior_inl_th=1e-5),
            )
            assert bool(est.success[0])
            r_err = np.degrees(float(geodesic_distance(
                est.R[0], jnp.asarray(T[:3, :3]))))
            t_dir = T[:3, 3] / np.linalg.norm(T[:3, 3])
            cos = abs(float(jnp.dot(est.t[0], jnp.asarray(t_dir))))
            errs.append((r_err, cos))
        r_errs = [e[0] for e in errs]
        assert np.median(r_errs) < 1.5, errs
        assert np.median([e[1] for e in errs]) > 0.98, errs


class TestConvergence:
    def test_loss_decreases_on_fixed_batch(self, rng):
        """Overfit one synthetic batch for a few steps; total loss and
        coarse loss must drop."""
        from far_tpu.data import Loader
        from far_tpu.train.optim import OptimConfig
        from far_tpu.train.trainer import Trainer
        from tests.test_models import small_config

        cfg = small_config()
        trainer = Trainer(cfg, OptimConfig(
            lr=3e-4, warmup_steps=0, scheduler="none"))
        ds = SyntheticPairDataset(n=8, hw=cfg.image_size)
        batch = next(iter(Loader(ds, np.arange(8), batch_size=8)))
        state = trainer.init(seed=0, batch_size=8)

        losses = []
        for i in range(8):
            state, metrics = trainer.step(state, batch,
                                          jax.random.PRNGKey(0))
            losses.append(float(np.asarray(metrics["loss"])))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
