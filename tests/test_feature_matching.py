"""Classical/precomputed matcher tests."""

import numpy as np
import pytest

from far_tpu.models.feature_matching import (
    PrecomputedMatching,
    SIFTMatching,
    pad_matches,
    precompute_matches,
)


class TestPadMatches:
    def test_pad_and_truncate(self):
        pts = np.arange(10, dtype=np.float32).reshape(5, 2)
        p0, p1, v = pad_matches(pts, pts, 8)
        assert v.sum() == 5 and (p0[5:] == 0).all()
        p0, p1, v = pad_matches(pts, pts, 3)
        assert v.sum() == 3


class TestSIFT:
    def test_matches_shifted_texture(self, rng):
        cv2 = pytest.importorskip("cv2")
        # textured image and a 5px-shifted copy
        base = (rng.uniform(size=(120, 160)) * 255).astype(np.uint8)
        base = cv2.GaussianBlur(base, (5, 5), 1.0)
        img0 = base
        img1 = np.roll(base, 5, axis=1)
        m = SIFTMatching(num_features=500, max_matches=256)
        p0, p1, v = m.match(img0, img1)
        assert v.sum() > 10
        dx = (p1[v][:, 0] - p0[v][:, 0])
        assert abs(np.median(dx) - 5.0) < 1.0


class TestPrecomputed:
    def test_roundtrip(self, tmp_path, rng):
        class FakeDS:
            def __getitem__(self, i):
                return {"pair_names": (f"a{i}", f"b{i}")}

        def matcher(sample):
            pts = rng.uniform(0, 100, size=(7, 2)).astype(np.float32)
            return pts, pts + 1

        path = tmp_path / "corr.npz"
        precompute_matches(FakeDS(), [0, 1], matcher, path)
        pm = PrecomputedMatching(path, max_matches=16)
        p0, p1, v = pm.match("a0", "b0")
        assert v.sum() == 7
        np.testing.assert_allclose(p1[v] - p0[v], 1.0, atol=1e-6)
        # missing pair -> empty
        _, _, v2 = pm.match("nope", "nope")
        assert v2.sum() == 0
