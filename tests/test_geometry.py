"""Deterministic unit tests for the geometry kernels against closed-form
synthetic scenes — the coverage the reference lacked (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from far_tpu.geometry import (
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    quaternion_to_matrix,
    matrix_to_quaternion,
    geodesic_distance,
    rotation_angle,
    so3_project,
    cross_product_matrix,
    essential_from_Rt,
    sampson_epipolar_distance,
    symmetrical_epipolar_distance,
    decompose_essential_matrix,
    motion_from_essential,
    run_8point,
    run_8point_essential,
    recover_pose_from_essential,
    triangulate_points,
    procrustes,
    normalize_points,
    transform_points,
    invert_pose34,
    compose_pose34,
    normalize_kpts_by_K,
    warp_kpts,
)


def random_rotation(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(quaternion_to_matrix(jnp.asarray(q)))


def synthetic_pair(rng, n_pts=64, noise=0.0):
    """Two calibrated views of a random 3D point cloud in front of both."""
    R = random_rotation(rng)
    # small-ish rotation so points stay in front of both cameras
    R = np.asarray(so3_project(jnp.asarray(0.25 * R + 0.75 * np.eye(3))))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    t *= 0.5
    P = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_pts, 3))
    x1 = P[:, :2] / P[:, 2:]
    P2 = P @ R.T + t
    x2 = P2[:, :2] / P2[:, 2:]
    if noise:
        x1 = x1 + rng.normal(size=x1.shape) * noise
        x2 = x2 + rng.normal(size=x2.shape) * noise
    return R, t, P, x1.astype(np.float32), x2.astype(np.float32)


class TestRotations:
    def test_6d_roundtrip(self, rng):
        R = random_rotation(rng, (16,))
        d6 = matrix_to_rotation_6d(jnp.asarray(R))
        R2 = rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_6d_is_rotation(self, rng):
        d6 = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        R = rotation_6d_to_matrix(d6)
        eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
        # f32 Gram-Schmidt on random (possibly near-parallel) inputs loses
        # a few digits to cancellation; 5e-3 matches the torch reference.
        np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (8, 1, 1)), atol=5e-3)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=5e-3)

    def test_quaternion_roundtrip(self, rng):
        R = random_rotation(rng, (32,))
        q = matrix_to_quaternion(jnp.asarray(R))
        R2 = quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_geodesic_zero_and_known(self, rng):
        R = random_rotation(rng, (4,))
        d = geodesic_distance(jnp.asarray(R), jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
        # 90 degrees about z
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        ang = rotation_angle(jnp.asarray(Rz)[None])
        np.testing.assert_allclose(np.asarray(ang), np.pi / 2, atol=1e-6)

    def test_so3_project(self, rng):
        R = random_rotation(rng)
        M = R + 0.01 * rng.normal(size=(3, 3))
        Rp = np.asarray(so3_project(jnp.asarray(M, jnp.float32)))
        np.testing.assert_allclose(Rp @ Rp.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(Rp) > 0


class TestEpipolar:
    def test_epipolar_constraint(self, rng):
        R, t, _, x1, x2 = synthetic_pair(rng)
        E = essential_from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        d = sampson_epipolar_distance(jnp.asarray(x1)[None], jnp.asarray(x2)[None], E[None])
        assert float(jnp.max(d)) < 1e-8
        d2 = symmetrical_epipolar_distance(jnp.asarray(x1)[None], jnp.asarray(x2)[None], E[None])
        assert float(jnp.max(d2)) < 1e-7

    def test_cross_product_matrix(self, rng):
        v = rng.normal(size=(5, 3)).astype(np.float32)
        w = rng.normal(size=(5, 3)).astype(np.float32)
        lhs = np.einsum("bij,bj->bi", np.asarray(cross_product_matrix(jnp.asarray(v))), w)
        np.testing.assert_allclose(lhs, np.cross(v, w), atol=1e-6)

    def test_decompose_essential(self, rng):
        R, t, _, _, _ = synthetic_pair(rng)
        tn = t / np.linalg.norm(t)
        E = essential_from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(tn, jnp.float32))
        Rs, ts = motion_from_essential(E)
        # one of the four candidates must match (R, t) up to sign of t
        r_errs = np.asarray(geodesic_distance(Rs, jnp.asarray(R, jnp.float32)[None]))
        t_errs = np.linalg.norm(np.asarray(ts) - tn[None], axis=-1)
        assert (r_errs.min() < 1e-3)
        assert ((r_errs < 1e-3) & (t_errs < 1e-3)).any()


class TestSolvers:
    def test_normalize_points(self, rng):
        pts = jnp.asarray(rng.normal(size=(2, 32, 2)) * 5 + 3, jnp.float32)
        pn, T = normalize_points(pts)
        mean_dist = jnp.mean(jnp.linalg.norm(pn, axis=-1), axis=-1)
        np.testing.assert_allclose(np.asarray(mean_dist), np.sqrt(2), atol=1e-4)
        # transform consistency
        pn2 = transform_points(T, pts)
        np.testing.assert_allclose(np.asarray(pn2), np.asarray(pn), atol=1e-4)

    def test_8point_recovers_pose(self, rng):
        R, t, _, x1, x2 = synthetic_pair(rng, n_pts=100)
        E = run_8point_essential(jnp.asarray(x1)[None], jnp.asarray(x2)[None])
        Rr, tr, n_good, _ = recover_pose_from_essential(
            E, jnp.asarray(x1)[None], jnp.asarray(x2)[None]
        )
        r_err = float(geodesic_distance(Rr[0], jnp.asarray(R, jnp.float32)))
        t_dir = np.asarray(tr[0])
        cos = abs(np.dot(t_dir, t / np.linalg.norm(t)))
        assert r_err < 1e-2, r_err
        assert cos > 0.999, cos
        assert float(n_good[0]) == 100

    def test_8point_weighted_ignores_outliers(self, rng):
        R, t, _, x1, x2 = synthetic_pair(rng, n_pts=80)
        # corrupt last 20 points, zero their weight
        x2c = x2.copy()
        x2c[60:] += rng.normal(size=(20, 2)) * 0.5
        w = np.ones(80, np.float32)
        w[60:] = 0.0
        E = run_8point_essential(
            jnp.asarray(x1)[None], jnp.asarray(x2c)[None], jnp.asarray(w)[None]
        )
        Rr, tr, _, _ = recover_pose_from_essential(
            E, jnp.asarray(x1)[None], jnp.asarray(x2)[None]
        )
        assert float(geodesic_distance(Rr[0], jnp.asarray(R, jnp.float32))) < 1e-2

    def test_fast_decompose_matches_svd(self, rng):
        from far_tpu.geometry.solvers import fast_decompose_essential

        for i in range(4):
            R, t, _, _, _ = synthetic_pair(rng)
            tn = t / np.linalg.norm(t)
            E = essential_from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(tn, jnp.float32))
            R1f, R2f, tf = fast_decompose_essential(E[None])
            R1s, R2s, ts = decompose_essential_matrix(E[None])
            # t up to sign
            assert min(
                float(jnp.linalg.norm(tf[0] - ts[0])),
                float(jnp.linalg.norm(tf[0] + ts[0])),
            ) < 1e-3
            # rotation pair matches up to ordering
            errs = [
                float(geodesic_distance(Ra[0], Rb[0]))
                for Ra in (R1f, R2f) for Rb in (R1s, R2s)
            ]
            assert sorted(errs)[0] < 1e-2 and sorted(errs)[1] < 1e-2

    def test_power_iteration_8point(self, rng):
        """'power' impl recovers the pose as well as 'eigh' on clean data."""
        R, t, _, x1, x2 = synthetic_pair(rng, n_pts=100)
        E = run_8point_essential(
            jnp.asarray(x1)[None], jnp.asarray(x2)[None], impl="power"
        )
        Rr, tr, _, _ = recover_pose_from_essential(
            E, jnp.asarray(x1)[None], jnp.asarray(x2)[None], method="fast"
        )
        assert float(geodesic_distance(Rr[0], jnp.asarray(R, jnp.float32))) < 2e-2

    def test_two_view_depths(self, rng):
        from far_tpu.geometry.solvers import two_view_depths

        R, t, P, x1, x2 = synthetic_pair(rng, n_pts=32)
        z1, z2 = two_view_depths(
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
            jnp.asarray(x1), jnp.asarray(x2),
        )
        np.testing.assert_allclose(np.asarray(z1), P[:, 2], rtol=1e-3)
        np.testing.assert_allclose(np.asarray(z2), (P @ R.T + t)[:, 2], rtol=1e-3)

    def test_triangulate(self, rng):
        R, t, P, x1, x2 = synthetic_pair(rng, n_pts=32)
        P1 = jnp.asarray(np.hstack([np.eye(3), np.zeros((3, 1))]), jnp.float32)
        P2 = jnp.asarray(np.hstack([R, t[:, None]]), jnp.float32)
        X = triangulate_points(P1[None], P2[None], jnp.asarray(x1)[None], jnp.asarray(x2)[None])
        np.testing.assert_allclose(np.asarray(X[0]), P, rtol=2e-2, atol=2e-2)

    def test_procrustes(self, rng):
        R, t, P, _, _ = synthetic_pair(rng, n_pts=32)
        A = jnp.asarray(P, jnp.float32)
        B = jnp.asarray(P @ R.T + t, jnp.float32)
        Rr, tr = procrustes(A[None], B[None])
        np.testing.assert_allclose(np.asarray(Rr[0]), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(tr[0]), t, atol=1e-4)

    def test_procrustes_weighted(self, rng):
        R, t, P, _, _ = synthetic_pair(rng, n_pts=40)
        B = P @ R.T + t
        B[30:] += 5.0  # corrupt, then mask out
        w = np.ones(40, np.float32)
        w[30:] = 0.0
        Rr, tr = procrustes(
            jnp.asarray(P, jnp.float32)[None],
            jnp.asarray(B, jnp.float32)[None],
            jnp.asarray(w)[None],
        )
        np.testing.assert_allclose(np.asarray(Rr[0]), R, atol=1e-4)


class TestTransforms:
    def test_invert_pose(self, rng):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        T = compose_pose34(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        Tinv = invert_pose34(T)
        RR = np.asarray(Tinv[:3, :3]) @ R
        np.testing.assert_allclose(RR, np.eye(3), atol=1e-5)

    def test_normalize_kpts(self):
        K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
        kpts = jnp.asarray([[320.0, 240.0], [820.0, 740.0]])
        out = np.asarray(normalize_kpts_by_K(kpts, K))
        np.testing.assert_allclose(out, [[0, 0], [1, 1]], atol=1e-6)


class TestWarp:
    def test_warp_identity(self, rng):
        B, H, W = 1, 48, 64
        depth = np.full((B, H, W), 2.0, np.float32)
        K = np.array([[[50.0, 0, 32], [0, 50, 24], [0, 0, 1]]], np.float32)
        T = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))])[None], (B, 1, 1)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(8, 40, 8), np.arange(8, 56, 8), indexing="ij")
        kpts = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)[None]
        valid, warped = warp_kpts(
            jnp.asarray(kpts), jnp.asarray(depth), jnp.asarray(depth),
            jnp.asarray(T), jnp.asarray(K), jnp.asarray(K),
        )
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(np.asarray(warped), kpts, atol=1e-2)

    def test_warp_translation(self, rng):
        """Pure x-translation shifts projections by f*tx/z."""
        B, H, W = 1, 48, 64
        depth0 = np.full((B, H, W), 2.0, np.float32)
        depth1 = np.full((B, H, W), 2.0, np.float32)
        K = np.array([[[50.0, 0, 32], [0, 50, 24], [0, 0, 1]]], np.float32)
        T = np.hstack([np.eye(3), np.array([[0.4], [0], [0]])])[None].astype(np.float32)
        kpts = np.array([[[32.0, 24.0], [20.0, 30.0]]], np.float32)
        valid, warped = warp_kpts(
            jnp.asarray(kpts), jnp.asarray(depth0), jnp.asarray(depth1),
            jnp.asarray(T), jnp.asarray(K), jnp.asarray(K),
        )
        # shift = fx * tx / z = 50 * 0.4 / 2 = 10 px
        np.testing.assert_allclose(np.asarray(warped[..., 0]), kpts[..., 0] + 10.0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(warped[..., 1]), kpts[..., 1], atol=1e-2)
