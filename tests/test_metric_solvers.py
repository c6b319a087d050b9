"""Tests for metric-scale solvers and DLT-PnP RANSAC on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.geometry import geodesic_distance, quaternion_to_matrix, so3_project
from far_tpu.solvers.metric import (
    PnPConfig,
    backproject_3d,
    metric_scale_mean,
    metric_scale_ransac,
    pnp_ransac,
)


def metric_scene(rng, n=128, H=120, W=160, noise=0.0):
    """Scene with GT metric pose + rendered depth at the keypoints."""
    f = 100.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    R = np.asarray(so3_project(jnp.asarray(0.2 * R + 0.8 * np.eye(3), jnp.float32)))
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t) * 1.7  # metric magnitude 1.7

    P = rng.uniform([-2, -2, 4], [2, 2, 9], size=(n, 3))
    uv0 = (P[:, :2] / P[:, 2:]) * f + [W / 2, H / 2]
    P1 = P @ R.T + t
    uv1 = (P1[:, :2] / P1[:, 2:]) * f + [W / 2, H / 2]

    # dense-ish depth maps: nearest splat of the sparse points
    depth0 = np.zeros((H, W), np.float32)
    depth1 = np.zeros((H, W), np.float32)
    ij0 = np.round(uv0).astype(int)
    ij1 = np.round(uv1).astype(int)
    in0 = (ij0[:, 0] >= 0) & (ij0[:, 0] < W) & (ij0[:, 1] >= 0) & (ij0[:, 1] < H)
    in1 = (ij1[:, 0] >= 0) & (ij1[:, 0] < W) & (ij1[:, 1] >= 0) & (ij1[:, 1] < H)
    keep = in0 & in1
    depth0[ij0[keep, 1], ij0[keep, 0]] = P[keep, 2]
    depth1[ij1[keep, 1], ij1[keep, 0]] = P1[keep, 2]

    uv0 = uv0[keep] + rng.normal(size=(keep.sum(), 2)) * noise
    uv1 = uv1[keep] + rng.normal(size=(keep.sum(), 2)) * noise
    return K, R, t, uv0.astype(np.float32), uv1.astype(np.float32), depth0, depth1, P[keep]


def pad(arr, n, fill=0.0):
    out = np.full((n,) + arr.shape[1:], fill, arr.dtype)
    out[: len(arr)] = arr
    return out


class TestMetricScale:
    def _setup(self, rng):
        K, R, t, uv0, uv1, d0, d1, P = metric_scene(rng)
        N = 160
        m = len(uv0)
        kp0 = jnp.asarray(pad(uv0, N))[None]
        kp1 = jnp.asarray(pad(uv1, N))[None]
        valid = jnp.asarray(pad(np.ones(m, bool), N, False))[None]
        return (jnp.asarray(R, jnp.float32)[None],
                jnp.asarray(t / np.linalg.norm(t), jnp.float32)[None],
                kp0, kp1,
                jnp.asarray(d0)[None], jnp.asarray(d1)[None],
                jnp.asarray(K)[None], jnp.asarray(K)[None], valid, t)

    def test_mean_scale(self, rng):
        R, tn, kp0, kp1, d0, d1, K0, K1, valid, t_gt = self._setup(rng)
        t_metric, ok = metric_scale_mean(R, tn, kp0, kp1, d0, d1, K0, K1, valid)
        assert bool(ok[0])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(t_metric[0])), np.linalg.norm(t_gt),
            rtol=0.05)

    def test_ransac_scale_robust_to_bad_depth(self, rng):
        R, tn, kp0, kp1, d0, d1, K0, K1, valid, t_gt = self._setup(rng)
        # corrupt a third of depth0 entries (simulates DPT depth noise)
        d0n = np.asarray(d0).copy()
        mask = np.asarray(kp0[0]).astype(int)
        bad = mask[::3]
        d0n[0, np.clip(bad[:, 1], 0, 119), np.clip(bad[:, 0], 0, 159)] *= 3.0
        t_metric, votes, ok = metric_scale_ransac(
            R, tn, kp0, kp1, jnp.asarray(d0n), d1, K0, K1, valid)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(t_metric[0])), np.linalg.norm(t_gt),
            rtol=0.1)

    def test_backproject(self, rng):
        K = jnp.asarray([[[100.0, 0, 80], [0, 100, 60], [0, 0, 1]]])
        kpts = jnp.asarray([[[80.0, 60.0], [180.0, 60.0]]])
        depth = jnp.asarray([[2.0, 4.0]])
        xyz = backproject_3d(kpts, depth, K)
        np.testing.assert_allclose(
            np.asarray(xyz[0]), [[0, 0, 2], [4, 0, 4]], atol=1e-5)


class TestPnP:
    def test_recovers_metric_pose(self, rng):
        K, R, t, uv0, uv1, d0, d1, P = metric_scene(rng, n=200)
        N = 256
        m = len(uv0)
        kp0 = jnp.asarray(pad(uv0, N))[None]
        kp1 = jnp.asarray(pad(uv1, N))[None]
        valid = jnp.asarray(pad(np.ones(m, bool), N, False))[None]
        Rr, tr, n_inl, ok = pnp_ransac(
            jax.random.PRNGKey(0), kp0, kp1,
            jnp.asarray(d0)[None], jnp.asarray(K)[None], jnp.asarray(K)[None],
            valid, PnPConfig(num_hypotheses=256),
        )
        assert bool(ok[0])
        r_err = np.degrees(float(geodesic_distance(
            Rr[0], jnp.asarray(R, jnp.float32))))
        assert r_err < 3.0, r_err
        np.testing.assert_allclose(np.asarray(tr[0]), t, atol=0.15)

    def test_pnp_with_outliers(self, rng):
        K, R, t, uv0, uv1, d0, d1, P = metric_scene(rng, n=200)
        m = len(uv0)
        n_out = m // 4
        uv1c = uv1.copy()
        uv1c[:n_out] = rng.uniform([0, 0], [160, 120], size=(n_out, 2))
        N = 256
        kp0 = jnp.asarray(pad(uv0, N))[None]
        kp1 = jnp.asarray(pad(uv1c, N))[None]
        valid = jnp.asarray(pad(np.ones(m, bool), N, False))[None]
        Rr, tr, n_inl, ok = pnp_ransac(
            jax.random.PRNGKey(1), kp0, kp1,
            jnp.asarray(d0)[None], jnp.asarray(K)[None], jnp.asarray(K)[None],
            valid, PnPConfig(num_hypotheses=512),
        )
        r_err = np.degrees(float(geodesic_distance(
            Rr[0], jnp.asarray(R, jnp.float32))))
        assert r_err < 5.0, r_err
        np.testing.assert_allclose(np.asarray(tr[0]), t, atol=0.3)
