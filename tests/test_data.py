"""Data layer tests: conventions, samplers, corruption, loader, synthetic."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from far_tpu.data import (
    Loader,
    Mp3dDataset,
    SyntheticPairDataset,
    collate_pairs,
    corrupt_correspondences,
    get_mp3d_T_0to1,
    rotation_from_viewpoint,
    scene_balance_indices,
)
from far_tpu.data.io import (
    mapfree_relative_pose,
    relative_rotation_from_viewpoints,
)
from far_tpu.data.sampler import sequential_indices


class TestConventions:
    def test_mp3d_identity_pose(self):
        T = get_mp3d_T_0to1({"position": [0, 0, 0],
                             "rotation": [1, 0, 0, 0]})
        np.testing.assert_allclose(T, np.eye(4), atol=1e-8)

    def test_mp3d_axis_flip_translation(self):
        """The sparseplane flip negates y and z of the translation."""
        T = get_mp3d_T_0to1({"position": [1.0, 2.0, 3.0],
                             "rotation": [1, 0, 0, 0]})
        np.testing.assert_allclose(T[:3, 3], [1.0, -2.0, -3.0], atol=1e-8)

    def test_viewpoint_rotation_orthonormal(self):
        R = rotation_from_viewpoint(0.3, -0.5)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-8)
        # zero viewpoint -> identity
        np.testing.assert_allclose(
            rotation_from_viewpoint(0, 0), np.eye(3), atol=1e-12)

    def test_relative_viewpoint_rotation(self):
        R = relative_rotation_from_viewpoints((0.1, 0.2), (0.1, 0.2))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-8)

    def test_mapfree_relative_pose_identity(self):
        q = np.array([1.0, 0, 0, 0])
        t = np.array([1.0, 2, 3])
        T = mapfree_relative_pose(q, t, q, t)
        np.testing.assert_allclose(T, np.eye(4), atol=1e-8)


class TestSamplers:
    def test_scene_balance_counts(self):
        idx = scene_balance_indices([10, 5, 20], 7, seed=0)
        assert len(idx) == 21
        # each scene contributes exactly 7
        assert ((idx < 10).sum()) == 7
        assert (((idx >= 10) & (idx < 15)).sum()) == 7

    def test_rank_slicing_partitions(self):
        full = [scene_balance_indices([10, 10], 8, seed=3, rank=r,
                                      world_size=4) for r in range(4)]
        cat = np.concatenate(full)
        assert len(cat) == 16
        ref = scene_balance_indices([10, 10], 8, seed=3)
        np.testing.assert_array_equal(np.sort(cat), np.sort(ref))

    def test_sequential_padding(self):
        shards = [sequential_indices(10, rank=r, world_size=4)
                  for r in range(4)]
        assert all(len(s) == 3 for s in shards)
        assert set(np.concatenate(shards)) == set(range(10))


class TestCorruption:
    def test_outliers_and_missing(self):
        rng = np.random.default_rng(0)
        corr = np.tile(np.array([[10.0, 10.0], [20.0, 20.0]]), (100, 1, 1))
        valid = np.ones(100, bool)
        c, v = corrupt_correspondences(
            corr, valid, rng, outlier_pct=0.5, missing_pct=0.2)
        moved = (np.abs(c[:, 1] - [20, 20]).sum(-1) > 1.0) & v
        assert 25 <= moved.sum() <= 55  # ~50 outliers minus the masked ones
        assert v.sum() == 80

    def test_dropout_zeroes_invalid(self):
        rng = np.random.default_rng(0)
        corr = np.ones((50, 2, 2))
        valid = np.ones(50, bool)
        c, v = corrupt_correspondences(corr, valid, rng, corr_dropout=0.5)
        assert (c[~v] == 0).all()


class TestSyntheticAndLoader:
    def test_synthetic_geometry_consistency(self):
        """Splatted depth + pose must satisfy the epipolar constraint."""
        ds = SyntheticPairDataset(n=2, hw=(120, 160))
        s = ds[0]
        from far_tpu.geometry import essential_from_Rt, sampson_epipolar_distance
        from far_tpu.geometry.transforms import normalize_kpts_by_K

        T = s["T_0to1"]
        E = essential_from_Rt(jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3]))
        # sample pixels with valid depth in both views via warp
        ys, xs = np.where(s["depth0"] > 0)
        pts0 = np.stack([xs, ys], -1)[:50].astype(np.float32)
        from far_tpu.geometry import warp_kpts

        valid, w = warp_kpts(
            jnp.asarray(pts0)[None], jnp.asarray(s["depth0"])[None],
            jnp.asarray(s["depth1"])[None], jnp.asarray(T[:3])[None],
            jnp.asarray(s["K0"])[None], jnp.asarray(s["K1"])[None],
        )
        v = np.asarray(valid[0])
        assert v.sum() > 10
        p0 = normalize_kpts_by_K(jnp.asarray(pts0[v]), jnp.asarray(s["K0"]))
        p1 = normalize_kpts_by_K(jnp.asarray(np.asarray(w[0])[v]),
                                 jnp.asarray(s["K1"]))
        d = sampson_epipolar_distance(p0, p1, E)
        assert float(jnp.median(d)) < 1e-5

    def test_loader_batches(self):
        ds = SyntheticPairDataset(n=8, hw=(64, 64))
        loader = Loader(ds, np.arange(8), batch_size=4)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b.image0.shape == (4, 64, 64, 1)
        assert b.T_0to1.shape == (4, 4, 4)
        assert b.depth0.shape == (4, 64, 64)

    def test_loader_multiworker_order_and_errors(self):
        """workers>1 must yield batches in the exact single-worker order
        (round-robin queues) and surface worker exceptions."""
        ds = SyntheticPairDataset(n=12, hw=(32, 32))
        ref = [np.asarray(b.pair_id)
               for b in Loader(ds, np.arange(12), batch_size=2)]
        got = [np.asarray(b.pair_id)
               for b in Loader(ds, np.arange(12), batch_size=2, workers=3)]
        assert len(got) == len(ref) == 6
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

        class Boom:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(Loader(Boom(), np.arange(4), batch_size=2, workers=2))

    def test_mp3d_dataset_from_fixture(self, tmp_path):
        """Round-trip the mp3d json/pair layout with tiny fixture files."""
        from PIL import Image

        scene = tmp_path / "imgs" / "sceneA"
        scene.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for name in ("a.png", "b.png"):
            Image.fromarray(
                rng.integers(0, 255, (48, 64), np.uint8)).save(scene / name)
        data = {"data": [{
            "0": {"file_name": "x/imgs/sceneA/a.png"},
            "1": {"file_name": "x/imgs/sceneA/b.png"},
            "rel_pose": {"position": [0.1, 0.2, 0.3],
                         "rotation": [1, 0, 0, 0]},
        }]}
        jpath = tmp_path / "pairs.json"
        jpath.write_text(json.dumps(data))
        ds = Mp3dDataset(jpath, tmp_path, mode="test",
                         resize_wh=(64, 48))
        s = ds[0]
        assert s["image0"].shape == (48, 64, 1)
        np.testing.assert_allclose(
            s["T_0to1"][:3, 3], [0.1, -0.2, -0.3], atol=1e-6)


class TestCachedCorrespondences:
    def test_cached_dataset_with_ablation(self, tmp_path):
        """precompute -> cached dataset -> corrupted correspondence batch."""
        from far_tpu.data.datasets import CachedCorrespondenceDataset
        from far_tpu.geometry import warp_kpts
        from far_tpu.models.feature_matching import precompute_matches

        base = SyntheticPairDataset(n=4, hw=(64, 64))
        rng2 = np.random.default_rng(1)

        def oracle(sample):
            ys, xs = np.where(sample["depth0"] > 0)
            pts0 = np.stack([xs, ys], -1)[:64].astype(np.float32)
            _, w = warp_kpts(
                jnp.asarray(pts0)[None],
                jnp.asarray(sample["depth0"])[None],
                jnp.asarray(sample["depth1"])[None],
                jnp.asarray(sample["T_0to1"][:3])[None],
                jnp.asarray(sample["K0"])[None],
                jnp.asarray(sample["K1"])[None])
            return pts0, np.asarray(w[0])

        path = tmp_path / "corr.npz"
        precompute_matches(base, range(4), oracle, path)

        ds = CachedCorrespondenceDataset(
            base, path, max_matches=128, missing_pct=0.25,
            image_hw=(64, 64))
        s = ds[0]
        assert s["correspondences"].shape == (128, 2, 2)
        assert "image0" not in s
        assert 40 <= s["num_correspondences"] <= 50  # 64 * 0.75
