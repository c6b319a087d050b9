"""Tests for the on-device prior-RANSAC engine with synthetic outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.geometry import geodesic_distance, so3_project, quaternion_to_matrix
from far_tpu.solvers import (
    PoseEstimate,
    PriorParams,
    RansacConfig,
    SolverConfig,
    estimate_pose,
    prior_ransac,
)
from far_tpu.solvers.pose_estimation import default_prior_pcl


def make_scene(rng, n_inliers=150, n_outliers=50, n_pad=56, noise=1e-3):
    """Synthetic calibrated pair with outliers and padding."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    R = np.asarray(so3_project(jnp.asarray(0.3 * R + 0.7 * np.eye(3), jnp.float32)))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    P = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_inliers, 3))
    x1 = P[:, :2] / P[:, 2:]
    P2 = P @ R.T + t
    x2 = P2[:, :2] / P2[:, 2:]
    x1 += rng.normal(size=x1.shape) * noise
    x2 += rng.normal(size=x2.shape) * noise
    # outliers: random mismatches
    o1 = rng.uniform(-0.5, 0.5, size=(n_outliers, 2))
    o2 = rng.uniform(-0.5, 0.5, size=(n_outliers, 2))
    kp1 = np.concatenate([x1, o1, np.zeros((n_pad, 2))]).astype(np.float32)
    kp2 = np.concatenate([x2, o2, np.zeros((n_pad, 2))]).astype(np.float32)
    valid = np.zeros(len(kp1), bool)
    valid[: n_inliers + n_outliers] = True
    return R, t, kp1, kp2, valid


class TestPriorRansac:
    def test_rejects_outliers(self, rng):
        R, t, kp1, kp2, valid = make_scene(rng)
        cfg = RansacConfig(num_hypotheses=512, inl_th=1e-5)
        est = prior_ransac(
            jax.random.PRNGKey(0),
            jnp.asarray(kp1)[None],
            jnp.asarray(kp2)[None],
            jnp.asarray(valid)[None],
            cfg=cfg,
        )
        r_err = float(geodesic_distance(est.R[0], jnp.asarray(R, jnp.float32)))
        cos = abs(float(jnp.dot(est.t[0], jnp.asarray(t, jnp.float32))))
        assert np.degrees(r_err) < 2.0, np.degrees(r_err)
        assert cos > 0.995
        assert bool(est.success[0])
        # inliers should mostly be the true inliers
        inl = np.asarray(est.inliers[0])
        assert inl[:150].mean() > 0.8
        assert inl[150:200].mean() < 0.1
        # tight counts are monotone
        assert float(est.num_ultra_tight[0]) <= float(est.num_tight[0]) <= float(
            est.num_inliers[0]
        )

    def test_prior_biasing_helps_heavy_outliers(self, rng):
        """With 75% outliers, a correct prior should not hurt and the
        prior-scored estimate should stay close to the prior pose."""
        R, t, kp1, kp2, valid = make_scene(rng, n_inliers=40, n_outliers=120, n_pad=96)
        prior_rt = np.hstack([R, (t / np.linalg.norm(t))[:, None]]).astype(np.float32)
        cfg = RansacConfig(num_hypotheses=512, inl_th=1e-5)
        prior = PriorParams(
            rt=jnp.asarray(prior_rt)[None], pcl=default_prior_pcl()
        )
        est = prior_ransac(
            jax.random.PRNGKey(1),
            jnp.asarray(kp1)[None],
            jnp.asarray(kp2)[None],
            jnp.asarray(valid)[None],
            prior=prior,
            cfg=cfg,
        )
        r_err = np.degrees(float(geodesic_distance(est.R[0], jnp.asarray(R, jnp.float32))))
        assert r_err < 5.0, r_err

    def test_failure_flag_on_too_few(self, rng):
        kp = jnp.zeros((1, 32, 2), jnp.float32)
        valid = jnp.zeros((1, 32), bool).at[0, :4].set(True)
        est = prior_ransac(jax.random.PRNGKey(0), kp, kp, valid)
        assert not bool(est.success[0])
        np.testing.assert_allclose(np.asarray(est.R[0]), np.eye(3), atol=1e-6)
        assert float(est.num_inliers[0]) == 0.0

    def test_magsac_scoring_ab(self, rng):
        """MAGSAC-style sigma-marginalized scoring (the mapfree
        cv2.USAC_MAGSAC equivalent, pose_solver.py:81-83) must be at
        least as accurate as the hard inlier count at equal hypotheses
        (VERDICT r2 #5). A/B on noisy scenes where the hard threshold is
        generously mis-set — the regime MAGSAC exists for."""
        import dataclasses

        scenes = [make_scene(rng, noise=2e-3) for _ in range(6)]
        kp1 = jnp.stack([jnp.asarray(s[2]) for s in scenes])
        kp2 = jnp.stack([jnp.asarray(s[3]) for s in scenes])
        valid = jnp.stack([jnp.asarray(s[4]) for s in scenes])
        base = RansacConfig(num_hypotheses=512, inl_th=3e-4, polish=False)

        def med_err(cfg, seed=5):
            est = prior_ransac(jax.random.PRNGKey(seed), kp1, kp2, valid,
                               cfg=cfg)
            errs = [np.degrees(float(geodesic_distance(
                est.R[b], jnp.asarray(s[0], jnp.float32))))
                for b, s in enumerate(scenes)]
            return float(np.median(errs))

        plain = med_err(base)
        soft = med_err(dataclasses.replace(base, scoring="magsac"))
        assert soft <= plain * 1.05 + 0.05, (soft, plain)

    def test_jit_and_vmap_batching(self, rng):
        """Engine must be jittable and support B>1."""
        scenes = [make_scene(rng) for _ in range(2)]
        kp1 = jnp.stack([jnp.asarray(s[2]) for s in scenes])
        kp2 = jnp.stack([jnp.asarray(s[3]) for s in scenes])
        valid = jnp.stack([jnp.asarray(s[4]) for s in scenes])
        cfg = RansacConfig(num_hypotheses=256, inl_th=1e-5)
        fn = jax.jit(lambda k, a, b, v: prior_ransac(k, a, b, v, cfg=cfg))
        est = fn(jax.random.PRNGKey(0), kp1, kp2, valid)
        for b, (R, t, *_rest) in enumerate(scenes):
            r_err = np.degrees(
                float(geodesic_distance(est.R[b], jnp.asarray(R, jnp.float32)))
            )
            assert r_err < 3.0, (b, r_err)


class TestEstimatePose:
    def test_pixel_threshold_path(self, rng):
        R, t, kp1n, kp2n, valid = make_scene(rng)
        # lift normalized coords into pixels with a synthetic K
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        kp1 = kp1n * 500 + np.array([320, 240], np.float32)
        kp2 = kp2n * 500 + np.array([320, 240], np.float32)
        est = estimate_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(kp1)[None],
            jnp.asarray(kp2)[None],
            jnp.asarray(K)[None],
            jnp.asarray(K)[None],
            jnp.asarray(valid)[None],
            cfg=SolverConfig(solver="ransac", num_hypotheses=512, pixel_thr=1.0),
        )
        r_err = np.degrees(float(geodesic_distance(est.R[0], jnp.asarray(R, jnp.float32))))
        assert r_err < 2.0, r_err
        cos = abs(float(jnp.dot(est.t[0], jnp.asarray(t, jnp.float32))))
        assert cos > 0.99

    def test_translation_scale(self, rng):
        R, t, kp1n, kp2n, valid = make_scene(rng)
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        kp1 = kp1n * 500 + np.array([320, 240], np.float32)
        kp2 = kp2n * 500 + np.array([320, 240], np.float32)
        est = estimate_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(kp1)[None],
            jnp.asarray(kp2)[None],
            jnp.asarray(K)[None],
            jnp.asarray(K)[None],
            jnp.asarray(valid)[None],
            translation_scale=jnp.asarray([2.5]),
            cfg=SolverConfig(solver="ransac", num_hypotheses=256, pixel_thr=1.0),
        )
        np.testing.assert_allclose(float(jnp.linalg.norm(est.t[0])), 2.5, rtol=1e-4)
