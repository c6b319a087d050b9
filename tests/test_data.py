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


class TestMapFreeOnDisk:
    """Fixture round-trips for the MapFree on-disk layout (reference
    mapfree_6dreg/lib/datasets/mapfree.py:12-191)."""

    @staticmethod
    def _write_scene(scene, n_query=5, wh=(64, 48), with_depth=False):
        from PIL import Image

        rng = np.random.default_rng(int(str(scene.name)[1:] or 0))
        W, H = wh
        frames = ["seq0/frame_00000.jpg"] + [
            f"seq1/frame_{i:05d}.jpg" for i in range(n_query)]
        (scene / "seq0").mkdir(parents=True)
        (scene / "seq1").mkdir(parents=True)
        intr, poses = ["# frame fx fy cx cy W H"], ["# frame qw qx qy qz tx ty tz"]
        qts = {}
        for f in frames:
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), np.uint8)).save(scene / f)
            fx, fy = rng.uniform(50, 70, 2)
            intr.append(f"{f} {fx} {fy} {W / 2} {H / 2} {W} {H}")
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            if f.startswith("seq0"):
                q, t = np.array([1.0, 0, 0, 0]), np.zeros(3)
            poses.append(f"{f} " + " ".join(map(str, [*q, *t])))
            qts[f] = (q, t)
            if with_depth:
                d = (rng.uniform(500, 3000, (H, W))).astype(np.uint16)
                Image.fromarray(d).save(
                    scene / f.replace(".jpg", ".dptkitti.png"))
        (scene / "intrinsics.txt").write_text("\n".join(intr))
        (scene / "poses.txt").write_text("\n".join(poses))
        return qts

    def test_val_scene_from_files(self, tmp_path):
        from scipy.spatial.transform import Rotation

        from far_tpu.data import MapFreeDataset

        root = tmp_path / "mapfree"
        qts = self._write_scene(root / "val" / "s00000", n_query=5,
                                with_depth=True)
        ds = MapFreeDataset(root, split="val", resize_wh=(32, 24),
                            reg_resize_wh=(16, 12),
                            estimated_depth="dptkitti")
        # val sample_factor=5 (reference mapfree.py:205): 5 queries -> 1
        assert len(ds) == 1
        s = ds[0]
        assert s["pair_names"] == ("seq0/frame_00000.jpg",
                                   "seq1/frame_00000.jpg")
        assert int(s["pair_id"]) == 0
        assert s["image0"].shape == (24, 32, 1)
        assert s["image0_reg"].shape == (12, 16, 3)
        assert s["depth0"].shape == (48, 64)
        assert 0.5 <= float(s["depth0"].mean()) <= 3.0  # mm -> m

        # K rescale must include the half-pixel center shift
        # (reference correct_intrinsic_scale, utils.py:176-189)
        sx, sy = 32 / 64, 24 / 48
        fx = float(s["K1"][0, 0]) / sx
        expected_cx = sx * 32.0 + sx / 2 - 0.5
        assert abs(float(s["K1"][0, 2]) - expected_cx) < 1e-5
        assert 50 <= fx <= 70

        # relative pose vs an independent quaternion path (scipy):
        # q12 = q1 * q0^-1, t12 = t1 - R12 t0 (reference mapfree.py:162-167)
        q0, t0 = qts["seq0/frame_00000.jpg"]
        q1, t1 = qts["seq1/frame_00000.jpg"]
        R0 = Rotation.from_quat(q0, scalar_first=True).as_matrix()
        R1 = Rotation.from_quat(q1, scalar_first=True).as_matrix()
        R12 = R1 @ R0.T
        t12 = t1 - R12 @ t0
        np.testing.assert_allclose(s["T_0to1"][:3, :3], R12, atol=1e-5)
        np.testing.assert_allclose(s["T_0to1"][:3, 3], t12, atol=1e-5)
        # abs camera center c = -R^T t
        np.testing.assert_allclose(
            s["abs_c_1"], -R1.T @ t1, atol=1e-5)

    def test_overlap_filtered_training_pairs(self, tmp_path):
        from far_tpu.data import MapFreeScene

        scene = tmp_path / "train" / "s00001"
        self._write_scene(scene, n_query=4)
        # reference overlaps.npz layout: idxs (N, 4) uint16 rows
        # [seqA, imA, seqB, imB] + overlaps (N,) scores; filter is STRICT
        # (overlaps > lo) & (overlaps < hi)  (mapfree.py:86-93)
        idxs = np.array([[0, 0, 1, 0], [0, 0, 1, 1], [1, 0, 1, 2],
                         [0, 0, 1, 3]], np.uint16)
        overlaps = np.array([0.2, 0.5, 0.6, 0.8])
        np.savez(scene / "overlaps.npz", idxs=idxs, overlaps=overlaps)
        sc = MapFreeScene(scene, resize_wh=(32, 24),
                          overlap_limits=(0.2, 0.8))
        # 0.2 and 0.8 excluded (strict), rows 1-2 kept incl. seq1<->seq1
        assert sc.pairs == [
            ("seq0/frame_00000.jpg", "seq1/frame_00001.jpg"),
            ("seq1/frame_00000.jpg", "seq1/frame_00002.jpg")]
        s = sc[1]
        assert s["pair_names"][0] == "seq1/frame_00000.jpg"
        assert np.isfinite(s["T_0to1"]).all()


class TestInteriornetStreetlearnOnDisk:
    """Fixture round-trip for the npy metadata format (reference
    interiornetStreetlearn_8ptVit/src/data_readers/interiornet.py:57-90)."""

    def test_dataset_from_metadata_npy(self, tmp_path):
        from PIL import Image
        from scipy.spatial.transform import Rotation

        from far_tpu.data.datasets import InteriornetStreetlearnDataset

        rng = np.random.default_rng(3)
        (tmp_path / "scene").mkdir()
        records = {}
        vps = {}
        for i in range(3):
            for j, im in enumerate(("a", "b")):
                Image.fromarray(rng.integers(
                    0, 255, (32, 32, 3), np.uint8)).save(
                        tmp_path / "scene" / f"{i}{im}.png")
            x1, y1, x2, y2 = rng.uniform(-1, 1, 4)
            records[i] = {
                "img1": {"path": f"scene/{i}a.png", "x": x1, "y": y1},
                "img2": {"path": f"scene/{i}b.png", "x": x2, "y": y2},
            }
            vps[i] = (x1, y1, x2, y2)
        meta = tmp_path / "train_pair_rotation_overlap.npy"
        # reference loads via np.load(..., allow_pickle=True) then
        # np.array(raw, ndmin=1)[0] -> a dict keyed by pair index
        np.save(meta, records, allow_pickle=True)

        ds = InteriornetStreetlearnDataset(meta, tmp_path,
                                           resize_wh=(64, 48))
        assert len(ds) == 3
        s = ds[1]
        assert s["image0"].shape == (48, 64, 1)
        assert s["image0_rgb"].shape == (48, 64, 3)
        # GT is rotation-only: R = R2 @ R1^T with per-view
        # R_i = Ry(-y_i) @ Rx(x_i)  (reference interiornet.py:22-45
        # compute_rotation_matrix_from_viewpoint: rotay = -y)
        x1, y1, x2, y2 = vps[1]
        R1 = Rotation.from_euler("YX", [-y1, x1]).as_matrix()
        R2 = Rotation.from_euler("YX", [-y2, x2]).as_matrix()
        np.testing.assert_allclose(
            s["T_0to1"][:3, :3], R2 @ R1.T, atol=1e-5)
        np.testing.assert_allclose(s["T_0to1"][:3, 3], 0, atol=1e-7)
