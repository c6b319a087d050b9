"""Tests for the batched Nister 5-point solver and its RANSAC path."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.geometry import geodesic_distance
from far_tpu.geometry.fivepoint import (
    det_gauss,
    durand_kerner_roots,
    run_5point_essential,
)
from far_tpu.solvers import RansacConfig, prior_ransac

from tests.test_ransac import make_scene


def make_minimal_pair(seed, noise=0.0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    P = rng.uniform(-1, 1, (5, 3))
    P[:, 2] = rng.uniform(2, 6, 5)
    p1 = P[:, :2] / P[:, 2:3]
    P2 = P @ R.T + t
    p2 = P2[:, :2] / P2[:, 2:3]
    p1 = p1 + rng.normal(0, noise, p1.shape)
    p2 = p2 + rng.normal(0, noise, p2.shape)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    E = E * np.sqrt(2) / np.linalg.norm(E)
    return p1.astype(np.float32), p2.astype(np.float32), E


class TestSmallLinalg:
    def test_det_gauss_matches_numpy(self, rng):
        M = rng.normal(size=(64, 10, 10)).astype(np.float32)
        d = np.asarray(det_gauss(jnp.asarray(M)))
        d_np = np.linalg.det(M.astype(np.float64))
        assert np.allclose(d, d_np, rtol=1e-3, atol=1e-4)

    def test_det_gauss_singular(self):
        M = np.zeros((2, 10, 10), np.float32)
        M[0] = np.eye(10)
        d = np.asarray(det_gauss(jnp.asarray(M)))
        assert np.allclose(d, [1.0, 0.0])

    def test_durand_kerner_known_roots(self, rng):
        # polynomials with known real roots across magnitudes
        true = np.sort(rng.uniform(-3, 3, (32, 10)), axis=-1)
        coeffs = np.stack([np.poly(r)[::-1] for r in true])  # ascending
        roots = np.asarray(durand_kerner_roots(
            jnp.asarray(coeffs, jnp.float32)))
        for i in range(32):
            got = np.sort(roots[i].real)
            # every true root matched by some DK root
            d = np.abs(got[None, :] - true[i][:, None]).min(axis=1)
            assert (d < 5e-2 * (1 + np.abs(true[i]))).mean() > 0.85


class TestFivePoint:
    def test_exact_recovery_rate(self):
        B = 64
        triples = [make_minimal_pair(s) for s in range(B)]
        p1 = jnp.asarray(np.stack([t[0] for t in triples]))
        p2 = jnp.asarray(np.stack([t[1] for t in triples]))
        E, valid = run_5point_essential(p1, p2)
        E, valid = np.asarray(E), np.asarray(valid)
        hits = 0
        for b in range(B):
            Egt = triples[b][2]
            al = np.abs((E[b] * Egt).sum((-2, -1))) / (
                np.linalg.norm(E[b], axis=(-2, -1)) * np.linalg.norm(Egt)
                + 1e-12)
            if np.where(valid[b], al, 0).max() > 0.999:
                hits += 1
        assert hits >= int(0.85 * B), f"{hits}/{B} exact recoveries"

    def test_candidates_satisfy_epipolar_constraints(self):
        p1, p2, _ = make_minimal_pair(3)
        E, valid = run_5point_essential(jnp.asarray(p1)[None],
                                        jnp.asarray(p2)[None])
        E, valid = np.asarray(E)[0], np.asarray(valid)[0]
        h1 = np.concatenate([p1, np.ones((5, 1), np.float32)], -1)
        h2 = np.concatenate([p2, np.ones((5, 1), np.float32)], -1)
        for c in range(len(E)):
            if not valid[c]:
                continue
            resid = np.abs(np.einsum("ni,ij,nj->n", h2, E[c], h1)).max()
            assert resid < 5e-3, resid
            # essential-manifold property: det ~ 0
            assert abs(np.linalg.det(E[c].astype(np.float64))) < 5e-2

    def test_degenerate_points_masked_or_finite(self):
        p = np.zeros((1, 5, 2), np.float32)  # all-identical points
        E, valid = run_5point_essential(jnp.asarray(p), jnp.asarray(p))
        assert np.isfinite(np.asarray(E)).all()


class TestRansac5pt:
    def test_5pt_ransac_recovers_pose(self, rng):
        R, t, kp1, kp2, valid = make_scene(rng)
        cfg = RansacConfig(num_hypotheses=512, inl_th=1e-5,
                           minimal_solver="5pt")
        est = prior_ransac(
            jax.random.PRNGKey(0),
            jnp.asarray(kp1)[None], jnp.asarray(kp2)[None],
            jnp.asarray(valid)[None], cfg=cfg,
        )
        r_err = float(geodesic_distance(est.R[0], jnp.asarray(R, jnp.float32)))
        cos = abs(float(jnp.dot(est.t[0], jnp.asarray(t, jnp.float32))))
        assert np.degrees(r_err) < 2.0, np.degrees(r_err)
        assert cos > 0.995
        assert bool(est.success[0])

    def test_5pt_no_polish_beats_8pt_no_polish_with_noise(self, rng):
        """The motivation for 5-point hypotheses: minimal samples of 5 are
        less noise-sensitive than 8 (raw hypothesis quality, polish off)."""
        errs = {"5pt": [], "8pt": []}
        for seed in range(4):
            r2 = np.random.default_rng(seed)
            R, t, kp1, kp2, valid = make_scene(r2, n_inliers=60,
                                               n_outliers=40, n_pad=28,
                                               noise=3e-3)
            for solver in ("5pt", "8pt"):
                cfg = RansacConfig(num_hypotheses=512, inl_th=3e-5,
                                   minimal_solver=solver, polish=False)
                est = prior_ransac(
                    jax.random.PRNGKey(seed),
                    jnp.asarray(kp1)[None], jnp.asarray(kp2)[None],
                    jnp.asarray(valid)[None], cfg=cfg,
                )
                errs[solver].append(np.degrees(float(
                    geodesic_distance(est.R[0], jnp.asarray(R, jnp.float32)))))
        assert np.mean(errs["5pt"]) <= np.mean(errs["8pt"]) + 0.5, errs
