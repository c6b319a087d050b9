"""Distribution parity: our RANSAC engine vs the reference prior_ransac
on identical synthetic scenes (VERDICT r2 item #2; see
tests/crossval_ransac.py for the harness and README for the
200-scene table).

Marked slow: drives the reference torch engine scene-by-scene.
"""

import numpy as np
import pytest

from tests.crossval_ransac import (
    SceneParams,
    crossval,
    make_scenes,
    run_ours,
    run_reference,
    summarize,
)

pytestmark = pytest.mark.slow


class TestShimDistanceParity:
    def test_epipolar_distances_match_jax(self):
        """The torch shim distances (which drive the reference engine)
        must agree with far_tpu.geometry.epipolar to f32 noise —
        otherwise the cross-validation compares apples to oranges."""
        import sys

        import jax.numpy as jnp
        import torch

        from tests.refloader import SHIMS

        sys.path.insert(0, SHIMS)
        try:
            from kornia.geometry.epipolar import (
                essential_from_Rt,
                sampson_epipolar_distance,
                symmetrical_epipolar_distance,
            )
        finally:
            sys.path.remove(SHIMS)
        import far_tpu.geometry.epipolar as fge

        rng = np.random.default_rng(3)
        p1 = rng.normal(size=(2, 64, 2)).astype(np.float32)
        p2 = rng.normal(size=(2, 64, 2)).astype(np.float32)
        E = rng.normal(size=(2, 3, 3)).astype(np.float32)
        for name, t_fn, j_fn in [
            ("sampson", sampson_epipolar_distance,
             fge.sampson_epipolar_distance),
            ("symmetric", symmetrical_epipolar_distance,
             fge.symmetrical_epipolar_distance),
        ]:
            ours = np.asarray(j_fn(jnp.asarray(p1), jnp.asarray(p2),
                                   jnp.asarray(E)))
            theirs = t_fn(torch.from_numpy(p1), torch.from_numpy(p2),
                          torch.from_numpy(E)).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4,
                                       atol=1e-5, err_msg=name)

        # essential_from_Rt convention (shim) vs our essential_from_Rt
        R1 = np.eye(3, dtype=np.float32)[None]
        t1 = np.zeros((1, 3, 1), np.float32)
        R2 = np.asarray(torch.linalg.qr(
            torch.from_numpy(rng.normal(size=(1, 3, 3)).astype(np.float32))
        )[0])
        t2 = rng.normal(size=(1, 3, 1)).astype(np.float32)
        theirs = essential_from_Rt(
            torch.from_numpy(R1), torch.from_numpy(t1),
            torch.from_numpy(np.ascontiguousarray(R2)),
            torch.from_numpy(t2)).numpy()
        ours = np.asarray(fge.essential_from_Rt(
            jnp.asarray(R2), jnp.asarray(t2[..., 0])))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestEngineDistributionParity:
    @pytest.fixture(scope="class")
    def results(self):
        p = SceneParams()
        scenes = make_scenes(30, p, seed=0)
        return (summarize(run_reference(scenes, p, 0)),
                summarize(run_ours(scenes, p, 0)))

    def test_pose_error_parity(self, results):
        ref, ours = results
        # medians at the f32 noise floor on clean scenes; ours must not
        # be worse than the reference by more than noise (0.05 deg)
        assert ours["med_r_err"] <= ref["med_r_err"] + 0.05, (ours, ref)
        assert ours["med_t_err"] <= ref["med_t_err"] + 0.25, (ours, ref)

    def test_inlier_count_parity(self, results):
        ref, ours = results
        # loose/tight counts within 10% of the reference engine's
        assert abs(ours["mean_n_inl"] - ref["mean_n_inl"]) \
            <= 0.10 * ref["mean_n_inl"], (ours, ref)
        assert abs(ours["mean_n_tight"] - ref["mean_n_tight"]) \
            <= 0.15 * ref["mean_n_tight"], (ours, ref)

    def test_heavy_outlier_parity(self):
        p = SceneParams(n_inliers=40, n_outliers=120, n_pad=96)
        scenes = make_scenes(15, p, seed=11)
        ref = summarize(run_reference(scenes, p, 11))
        ours = summarize(run_ours(scenes, p, 11))
        # prior-biased sampling must keep both engines converging
        assert ref["med_r_err"] < 1.0 and ours["med_r_err"] < 1.0, \
            (ref, ours)
        assert abs(ours["med_n_inl"] - ref["med_n_inl"]) \
            <= max(4.0, 0.15 * ref["med_n_inl"]), (ours, ref)
