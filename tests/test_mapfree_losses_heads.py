"""Map-free loss registry + extra head variants."""

import numpy as np
import jax
import jax.numpy as jnp

from far_tpu.geometry import quaternion_to_matrix
from far_tpu.models.sixdreg import (
    AngularBinsHead,
    ProcrustesHead,
    SixDRegConfig,
)
from far_tpu.train.mapfree_losses import (
    ROT_LOSSES,
    TRANS_LOSSES,
    combined_loss,
)


def rand_R(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(quaternion_to_matrix(jnp.asarray(q)))


class TestLossRegistry:
    def test_all_rot_losses_zero_at_identity(self, rng):
        R = jnp.asarray(rand_R(rng, 4), jnp.float32)
        for name, fn in ROT_LOSSES.items():
            if name == "rot_bin_loss":
                continue
            v = float(fn(R, R))
            assert v < 1e-4, (name, v)
            # and positive for different rotations
            R2 = jnp.asarray(rand_R(rng, 4), jnp.float32)
            assert float(fn(R, R2)) > v

    def test_all_trans_losses(self, rng):
        t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        for name, fn in TRANS_LOSSES.items():
            assert float(fn(t, t)) < 1e-3, name
            assert float(fn(t, t * 2 + 1.0)) > 0

    def test_combined_homoscedastic(self, rng):
        R = jnp.asarray(rand_R(rng, 2), jnp.float32)
        t = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
        total, parts = combined_loss(R, t, R, t * 1.5, lam=0.0,
                                     s_r=jnp.asarray(0.0),
                                     s_t=jnp.asarray(0.0))
        assert np.isfinite(float(total))

    def test_bin_loss_prefers_correct_bin(self):
        logits = jnp.zeros((1, 900)).at[0, 200].set(10.0)  # x bin 200 = 20deg
        gt_right = jnp.asarray([[20.0, 0.0, 0.0]])
        gt_wrong = jnp.asarray([[-100.0, 0.0, 0.0]])
        fn = ROT_LOSSES["rot_bin_loss"]
        assert float(fn(logits, gt_right)) < float(fn(logits, gt_wrong))


class TestExtraHeads:
    def test_procrustes_head(self, rng):
        cfg = SixDRegConfig(dtype="float32")
        head = ProcrustesHead(cfg, num_pts=6)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        vs = head.init(jax.random.PRNGKey(0), x)
        R, t = head.apply(vs, x, mutable=False)
        RRt = np.asarray(jnp.matmul(R, jnp.swapaxes(R, -1, -2)))
        np.testing.assert_allclose(RRt, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0,
                                   atol=1e-4)

    def test_angular_bins_head(self, rng):
        cfg = SixDRegConfig(dtype="float32")
        head = AngularBinsHead(cfg)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
        vs = head.init(jax.random.PRNGKey(0), x)
        R, t, bins = head.apply(vs, x, mutable=False)
        RRt = np.asarray(R[0] @ R[0].T)
        np.testing.assert_allclose(RRt, np.eye(3), atol=1e-4)
        assert bins.shape == (1, 900)


class TestAggregatorVariants:
    def test_qkv_and_concat(self, rng):
        from far_tpu.models.sixdreg import (
            ConcatAggregator,
            CorrelationVolumeWarpingQKV,
        )

        cfg = SixDRegConfig(dtype="float32")
        vol = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), jnp.float32)
        qkv = CorrelationVolumeWarpingQKV(cfg)
        vs = qkv.init(jax.random.PRNGKey(0), vol, vol)
        out = qkv.apply(vs, vol, vol, mutable=False)
        assert out.shape == (1, 4, 4, 8 + 8 + 2 + 1)
        cat = ConcatAggregator(cfg).apply({}, vol, vol)
        assert cat.shape == (1, 4, 4, 16)


class TestQuaternionHead:
    def test_output_is_rotation(self, rng):
        from far_tpu.models.sixdreg import QuaternionHead

        cfg = SixDRegConfig(dtype="float32")
        head = QuaternionHead(cfg)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        vs = head.init(jax.random.PRNGKey(0), x)
        R, t, q = head.apply(vs, x, mutable=False)
        RRt = np.asarray(jnp.matmul(R, jnp.swapaxes(R, -1, -2)))
        np.testing.assert_allclose(RRt, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-4)


class TestFeatureMatchingModel:
    def test_oracle_matcher_pose(self, rng):
        """matcher->solver baseline recovers the pose with oracle matches."""
        import jax as _jax

        from far_tpu.data import SyntheticPairDataset
        from far_tpu.geometry import geodesic_distance, warp_kpts
        from far_tpu.models.sixdreg import FeatureMatchingModel

        s = SyntheticPairDataset(n=1, hw=(240, 320))[0]

        class OracleMatcher:
            def match(self, img0, img1):
                ys, xs = np.where(s["depth0"] > 0)
                sel = np.linspace(0, len(xs) - 1, 256).astype(int)
                p0 = np.stack([xs[sel], ys[sel]], -1).astype(np.float32)
                valid, w = warp_kpts(
                    jnp.asarray(p0)[None], jnp.asarray(s["depth0"])[None],
                    jnp.asarray(s["depth1"])[None],
                    jnp.asarray(s["T_0to1"][:3])[None],
                    jnp.asarray(s["K0"])[None], jnp.asarray(s["K1"])[None])
                return p0, np.asarray(w[0]), np.asarray(valid[0])

        model = FeatureMatchingModel(OracleMatcher(), solver="essential",
                                     pixel_thr=1.0)
        R, t, n = model.estimate(_jax.random.PRNGKey(0), None, None,
                                 s["K0"], s["K1"])
        err = np.degrees(float(geodesic_distance(
            R, jnp.asarray(s["T_0to1"][:3, :3]))))
        assert err < 3.0, err
        assert n > 50
