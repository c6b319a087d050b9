"""Native preprocessing library tests (vs PIL / numpy references)."""

import numpy as np
import pytest

from far_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


class TestNativePreprocess:
    def test_upsample_matches_pil(self, lib_ok, rng):
        """On upsampling PIL's BILINEAR is plain half-pixel bilinear."""
        from PIL import Image

        img = rng.integers(0, 255, (32, 40, 3), np.uint8)
        ours = native.resize_bilinear_u8(img, 64, 80)
        ref = np.asarray(
            Image.fromarray(img).resize((80, 64), Image.BILINEAR))
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.mean() < 1.0 and diff.max() <= 2

    def test_downsample_matches_cv2(self, lib_ok, rng):
        """Downsampling is point-sampled bilinear (cv2 INTER_LINEAR
        semantics, the reference's resize path)."""
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 255, (64, 80, 3), np.uint8)
        ours = native.resize_bilinear_u8(img, 32, 40)
        ref = cv2.resize(img, (40, 32), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.mean() < 1.0 and diff.max() <= 2

    def test_resize_identity(self, lib_ok, rng):
        img = rng.integers(0, 255, (16, 16), np.uint8)
        out = native.resize_bilinear_u8(img, 16, 16)
        np.testing.assert_array_equal(out, img)

    def test_batched_resize(self, lib_ok, rng):
        imgs = rng.integers(0, 255, (4, 32, 32, 1), np.uint8)
        out = native.resize_bilinear_u8(imgs, 16, 16)
        assert out.shape == (4, 16, 16, 1)
        single = native.resize_bilinear_u8(imgs[0], 16, 16)
        np.testing.assert_array_equal(out[0], single)

    def test_gray_normalize(self, lib_ok):
        img = np.zeros((2, 2, 3), np.uint8)
        img[0, 0] = [255, 255, 255]
        img[0, 1] = [255, 0, 0]
        out = native.gray_normalize(img)
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-3)
        np.testing.assert_allclose(out[0, 1], 0.299, atol=1e-3)
        assert out.dtype == np.float32

    def test_normalize_u8(self, lib_ok, rng):
        img = rng.integers(0, 255, (8, 8), np.uint8)
        out = native.normalize_u8(img)
        np.testing.assert_allclose(out, img / 255.0, atol=1e-6)
