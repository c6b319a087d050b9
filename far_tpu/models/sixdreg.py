"""Map-free 6DReg: ResUNet encoder + correlation-volume warping + heads.

Equivalent of crockwell/far: mapfree_6dreg/lib/models/regression/
(encoder/resunet.py, encoder/preact.py, aggregator.py, head.py,
model.py:37-308). The FAR map-free configuration is: ResUNet
(PreActBottleneck 3-3-3, 32-d output at 1/4 res) -> CorrelationVolumeWarping
(position encoder + max-score channel) -> DeepResBlock feature head ->
vanilla transformer (d=256, 6 layers) -> MoE fusion with the solver pose
(regression_mlp, model.py:198-232).

The matcher+solver outer loop (reference model.py:286-306) lives in
far_tpu.pipeline.mapfree_forward — like the FAR-LoFTR pipeline, the whole
loop jits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from far_tpu.models.backbone import resize_bilinear_align_corners


@dataclasses.dataclass(frozen=True)
class SixDRegConfig:
    image_hw: Tuple[int, int] = (368, 272)   # padded 360x270 regressor input
    encoder_blocks: Tuple[int, ...] = (3, 3, 3)
    encoder_bottleneck: bool = True           # BLOCK_TYPE=1
    encoder_out_layers: int = 32
    not_concat: bool = False
    # aggregator flags (reference config/default.py AGGREGATOR tree)
    position_encoder: bool = True
    position_encoder_im1: bool = False
    max_score_channel: bool = True
    normalise_dot: bool = False
    cv_half_channels: bool = False
    use_vanilla_transformer: bool = True
    transformer_layers: int = 6
    transformer_heads: int = 8
    d_im: int = 256
    hidden: int = 512
    use_solver_preds: bool = True             # use_loftr_preds equivalent
    dtype: str = "bfloat16"


def _dt(cfg: SixDRegConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class PreActBlock(nn.Module):
    """Pre-activation ResNet block (reference preact.py:13-37)."""

    planes: int
    stride: int = 1
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: (
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name=n)
            if self.use_bn else (lambda y: y)
        )
        out = nn.relu(bn("bn1")(x))
        if self.stride != 1 or x.shape[-1] != self.planes:
            shortcut = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="shortcut")(out)
        else:
            shortcut = x
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        return out + shortcut


class PreActBottleneck(nn.Module):
    """Pre-activation bottleneck, expansion 4 (reference preact.py:40-70)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = 4 * self.planes
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype, name=n)
        out = nn.relu(bn("bn1")(x))
        if self.stride != 1 or x.shape[-1] != exp:
            shortcut = nn.Conv(exp, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="shortcut")(out)
        else:
            shortcut = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(bn("bn3")(out))
        out = nn.Conv(exp, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        return out + shortcut


class _ConvBNElu(nn.Module):
    planes: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.planes, (self.kernel, self.kernel),
                    padding=(self.kernel - 1) // 2, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.elu(x)


class ResUNet(nn.Module):
    """ResUNet encoder: H/2 stem, H/4..H/16 pre-act stages, decode to H/4.

    Reference resunet.py:41-128 (CAPS-style).
    """

    cfg: SixDRegConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = _dt(cfg)
        block = PreActBottleneck if cfg.encoder_bottleneck else PreActBlock
        nb = cfg.encoder_blocks

        x = x.astype(dt)
        x1 = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                     dtype=dt, name="firstconv")(x)
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=dt, name="firstbn")(x1)
        x1 = nn.relu(x1)
        x1 = nn.max_pool(x1, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        def stage(y, planes, n, stride, name):
            for i in range(n):
                y = block(planes, stride if i == 0 else 1, dtype=dt,
                          name=f"{name}_{i}")(y, train)
            return y

        x2 = stage(x1, 64, nb[0], 1, "encoder1")    # H/4
        x3 = stage(x2, 128, nb[1], 2, "encoder2")   # H/8
        x4 = stage(x3, 256, nb[2], 2, "encoder3")   # H/16

        def skipconnect(up, skip):
            """Reference resunet.py:91-104: zero-pad the SKIP map to the
            upsampled size (odd input dims make them differ by one) and
            concatenate [upsampled, skip] — this channel order is what
            the reference iconv weights expect (cat([x2, x1]))."""
            dh = up.shape[1] - skip.shape[1]
            dw = up.shape[2] - skip.shape[2]
            skip = jnp.pad(skip, ((0, 0), (dh // 2, dh - dh // 2),
                                  (dw // 2, dw - dw // 2), (0, 0)))
            return jnp.concatenate([up, skip], axis=-1)

        # decoder with align-corners bilinear upsample
        y = resize_bilinear_align_corners(x4)
        y = _ConvBNElu(512, 3, dt, name="upconv4")(y, train)
        if not cfg.not_concat:
            y = skipconnect(y, x3)
        y = _ConvBNElu(512, 3, dt, name="iconv4")(y, train)

        y = resize_bilinear_align_corners(y)
        y = _ConvBNElu(256, 3, dt, name="upconv3")(y, train)
        if not cfg.not_concat:
            y = skipconnect(y, x2)
        y = _ConvBNElu(256, 3, dt, name="iconv3")(y, train)

        return _ConvBNElu(cfg.encoder_out_layers, 1, dt,
                          name="outconv")(y, train)   # (B, H/4, W/4, 32)


class CorrelationVolumeWarping(nn.Module):
    """Global correlation volume + soft warp of the second feature map.

    Reference aggregator.py:6-116: cvolume = softmax(vol0^T vol1) over
    image-1 positions; vol1 warped by the distribution; optional channels
    for the expected match position and the max correlation score. On TPU
    this is three large MXU matmuls + a streamed softmax.
    """

    cfg: SixDRegConfig

    @nn.compact
    def __call__(self, vol0, vol1):
        cfg = self.cfg
        B, H, W, D = vol0.shape
        N = H * W
        f0 = vol0.reshape(B, N, D)
        f1 = vol1.reshape(B, N, D)
        if cfg.normalise_dot:
            f0 = f0 / (jnp.linalg.norm(f0, axis=-1, keepdims=True) + 1e-8)
            f1 = f1 / (jnp.linalg.norm(f1, axis=-1, keepdims=True) + 1e-8)
        d = D // 2 if cfg.cv_half_channels else D
        sim = jnp.einsum("bnc,bmc->bnm", f0[..., :d].astype(jnp.float32),
                         f1[..., :d].astype(jnp.float32))
        cvol = jax.nn.softmax(sim, axis=2)  # (B, N, M)

        warped = jnp.einsum("bnm,bmc->bnc", cvol, f1.astype(jnp.float32))
        parts = [f0.astype(jnp.float32), warped]

        if cfg.position_encoder:
            u = jnp.linspace(-1.0, 1.0, H)
            v = jnp.linspace(-1.0, 1.0, W)
            uu, vv = jnp.meshgrid(u, v, indexing="ij")
            grid = jnp.stack([uu, vv], -1).reshape(N, 2)  # (N, 2)
            pos = jnp.einsum("bnm,md->bnd", cvol, grid)   # expected position
            parts.append(pos)
            if cfg.position_encoder_im1:
                parts.append(jnp.tile(grid[None], (B, 1, 1)))
        if cfg.max_score_channel:
            parts.append(jnp.max(cvol, axis=2, keepdims=True))

        out = jnp.concatenate(parts, axis=-1)
        return out.reshape(B, H, W, -1).astype(vol0.dtype)


class CorrelationVolumeWarpingQKV(nn.Module):
    """Learned-projection variant: Q/K from vol0/vol1, V = vol1
    (reference aggregator.py:119-199). Optionally residual projections."""

    cfg: SixDRegConfig
    residual: bool = False

    @nn.compact
    def __call__(self, vol0, vol1):
        cfg = self.cfg
        dt = _dt(cfg)
        B, H, W, D = vol0.shape
        N = H * W
        f0 = vol0.reshape(B, N, D)
        f1 = vol1.reshape(B, N, D)
        q = nn.Dense(D, dtype=dt, name="q_proj")(f0)
        k = nn.Dense(D, dtype=dt, name="k_proj")(f1)
        if self.residual:
            q = q + f0
            k = k + f1
        sim = jnp.einsum("bnc,bmc->bnm", q.astype(jnp.float32),
                         k.astype(jnp.float32)) / D ** 0.5
        cvol = jax.nn.softmax(sim, axis=2)
        warped = jnp.einsum("bnm,bmc->bnc", cvol, f1.astype(jnp.float32))
        parts = [f0.astype(jnp.float32), warped]
        if cfg.position_encoder:
            u = jnp.linspace(-1.0, 1.0, H)
            v = jnp.linspace(-1.0, 1.0, W)
            uu, vv = jnp.meshgrid(u, v, indexing="ij")
            grid = jnp.stack([uu, vv], -1).reshape(N, 2)
            parts.append(jnp.einsum("bnm,md->bnd", cvol, grid))
        if cfg.max_score_channel:
            parts.append(jnp.max(cvol, axis=2, keepdims=True))
        out = jnp.concatenate(parts, axis=-1)
        return out.reshape(B, H, W, -1).astype(vol0.dtype)


class ConcatAggregator(nn.Module):
    """No-warping ablation: channel-concat of the two volumes
    (reference aggregator 'Concat' option, 3d3d_no_warping.yaml)."""

    cfg: SixDRegConfig

    @nn.compact
    def __call__(self, vol0, vol1):
        return jnp.concatenate([vol0, vol1], axis=-1)


class DeepResBlockHead(nn.Module):
    """Four pre-act stages; returns (pose9d|None, stage-3 features).

    Reference head.py:27-55 (DeepResBlock) + DirectDeepResBlockMLP:248-281.
    """

    cfg: SixDRegConfig
    full_forward_pass: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = _dt(self.cfg)
        x = PreActBlock(64, 2, dtype=dt, name="resblock1")(x, train)
        x = PreActBlock(128, 2, dtype=dt, name="resblock2")(x, train)
        x3 = PreActBlock(256, 2, dtype=dt, name="resblock3")(x, train)
        if not self.full_forward_pass:
            return None, x3
        y = PreActBlock(512, 2, dtype=dt, name="resblock4")(x3, train)
        y = jnp.mean(y, axis=(1, 2))  # AVG_POOL
        y = nn.relu(nn.Dense(256, dtype=dt, name="mlp_0")(y))
        y = nn.relu(nn.Dense(128, dtype=dt, name="mlp_1")(y))
        out = nn.Dense(9, dtype=dt, name="mlp_2")(y).astype(jnp.float32)
        # reference order: (ortho6d, t)
        pose = jnp.concatenate([out[..., 6:], out[..., :6]], -1)  # (t, rot)
        return pose, x3


class ProcrustesHead(nn.Module):
    """3D-3D correspondence head + differentiable Kabsch solve.

    Equivalent of crockwell/far: mapfree_6dreg/lib/models/regression/
    head.py ProcrustesDeepResBlock family: an MLP predicts num_pts 3D
    anchors per camera (optionally offset by the orthonormal basis), and
    the rigid pose comes from the closed-form weighted Procrustes solve
    (far_tpu.geometry.procrustes — differentiable through SVD).
    """

    cfg: SixDRegConfig
    num_pts: int = 6
    add_basis: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from far_tpu.geometry.solvers import procrustes

        dt = _dt(self.cfg)
        B = x.shape[0]
        x = PreActBlock(64, 2, dtype=dt, name="resblock1")(x, train)
        x = PreActBlock(128, 2, dtype=dt, name="resblock2")(x, train)
        x = PreActBlock(256, 2, dtype=dt, name="resblock3")(x, train)
        x = PreActBlock(512, 2, dtype=dt, name="resblock4")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(256, dtype=dt, name="mlp_0")(x))
        xyz = nn.Dense(3 * self.num_pts, dtype=dt, name="mlp_1")(y)
        xyz = xyz.reshape(B, -1, 3).astype(jnp.float32)

        basis = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        if self.num_pts == 3:
            cor0, cor1 = basis, xyz
        else:
            half = self.num_pts // 2
            cor0, cor1 = xyz[:, :half], xyz[:, half:]
        if self.add_basis and self.num_pts in (3, 6):
            if self.num_pts == 6:
                cor0 = cor0 + basis
            cor1 = cor1 + basis
        R, t = procrustes(cor0, cor1)
        return R, t


class AngularBinsHead(nn.Module):
    """Classification-style head: Euler-angle bins for R, optional
    spherical bins + scale for t (reference head.py:284-338)."""

    cfg: SixDRegConfig
    separate_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = _dt(self.cfg)
        B = x.shape[0]
        x = PreActBlock(64, 2, dtype=dt, name="resblock1")(x, train)
        x = PreActBlock(128, 2, dtype=dt, name="resblock2")(x, train)
        x = PreActBlock(256, 2, dtype=dt, name="resblock3")(x, train)
        x = PreActBlock(512, 2, dtype=dt, name="resblock4")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        out_dims = 900 + (541 if self.separate_scale else 3)
        out = nn.Dense(out_dims, dtype=dt, name="mlp")(x).astype(jnp.float32)

        R_bins = out[:, :900]
        ax = jnp.argmax(R_bins[:, :360], -1).astype(jnp.float32) - 180.0
        ay = jnp.argmax(R_bins[:, 360:540], -1).astype(jnp.float32) - 90.0
        az = jnp.argmax(R_bins[:, 540:900], -1).astype(jnp.float32) - 180.0

        def euler_xyz(ax, ay, az):
            a, b, c = (jnp.radians(v) for v in (ax, ay, az))
            ca, sa = jnp.cos(a), jnp.sin(a)
            cb, sb = jnp.cos(b), jnp.sin(b)
            cc, sc = jnp.cos(c), jnp.sin(c)
            Rx = jnp.stack([jnp.ones_like(a), 0 * a, 0 * a,
                            0 * a, ca, -sa, 0 * a, sa, ca],
                           -1).reshape(-1, 3, 3)
            Ry = jnp.stack([cb, 0 * b, sb, 0 * b, jnp.ones_like(b), 0 * b,
                            -sb, 0 * b, cb], -1).reshape(-1, 3, 3)
            Rz = jnp.stack([cc, -sc, 0 * c, sc, cc, 0 * c,
                            0 * c, 0 * c, jnp.ones_like(c)],
                           -1).reshape(-1, 3, 3)
            return Rz @ Ry @ Rx

        R = euler_xyz(ax, ay, az)
        if self.separate_scale:
            phi = jnp.radians(
                jnp.argmax(out[:, 900:1260], -1).astype(jnp.float32))
            theta = jnp.radians(
                jnp.argmax(out[:, 1260:1440], -1).astype(jnp.float32))
            scale = jnp.abs(out[:, -1])
            t = scale[:, None] * jnp.stack(
                [jnp.cos(phi) * jnp.sin(theta),
                 jnp.sin(phi) * jnp.sin(theta),
                 jnp.cos(theta)], -1)
        else:
            t = out[:, 900:903]
        return R, t, out[:, :900]


class QuaternionHead(nn.Module):
    """Quaternion rotation + scaled-direction translation head
    (reference head.py QuatDeepResBlock family)."""

    cfg: SixDRegConfig
    separate_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = _dt(self.cfg)
        B = x.shape[0]
        x = PreActBlock(64, 2, dtype=dt, name="resblock1")(x, train)
        x = PreActBlock(128, 2, dtype=dt, name="resblock2")(x, train)
        x = PreActBlock(256, 2, dtype=dt, name="resblock3")(x, train)
        x = PreActBlock(512, 2, dtype=dt, name="resblock4")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        out_dim = 4 + (4 if self.separate_scale else 3)
        out = nn.Dense(out_dim, dtype=dt, name="mlp")(x).astype(jnp.float32)
        from far_tpu.geometry.rotations import quaternion_to_matrix

        q = out[:, :4] / (jnp.linalg.norm(out[:, :4], axis=-1,
                                          keepdims=True) + 1e-8)
        R = quaternion_to_matrix(q)
        if self.separate_scale:
            direction = out[:, 4:7]
            direction = direction / (jnp.linalg.norm(
                direction, axis=-1, keepdims=True) + 1e-8)
            t = jnp.abs(out[:, 7:8]) * direction
        else:
            t = out[:, 4:7]
        return R, t, q


class FeatureMatchingModel:
    """Classical baseline: matcher -> solver -> (R, t).

    Equivalent of crockwell/far: mapfree_6dreg/lib/models/matching/
    model.py (FeatureMatchingModel) wired to the on-device solvers:
    essential (up-to-scale), essential+metric-depth, or PnP.
    """

    def __init__(self, matcher, solver: str = "essential",
                 pixel_thr: float = 2.0, scale_threshold: float = 0.1):
        self.matcher = matcher  # .match(img0, img1) -> (p0, p1, valid)
        self.solver = solver
        self.pixel_thr = pixel_thr
        self.scale_threshold = scale_threshold

    def estimate(self, key, img0, img1, K0, K1,
                 depth0=None, depth1=None):
        import jax.numpy as jnp

        from far_tpu.solvers import SolverConfig, estimate_pose
        from far_tpu.solvers.metric import metric_scale_ransac, pnp_ransac

        p0, p1, valid = self.matcher.match(img0, img1)
        p0 = jnp.asarray(p0)[None]
        p1 = jnp.asarray(p1)[None]
        valid = jnp.asarray(valid)[None]
        K0j = jnp.asarray(K0)[None]
        K1j = jnp.asarray(K1)[None]

        if self.solver == "pnp":
            R, t, n_inl, ok = pnp_ransac(
                key, p0, p1, jnp.asarray(depth0)[None], K0j, K1j, valid)
            return R[0], t[0], float(n_inl[0])

        est = estimate_pose(
            key, p0, p1, K0j, K1j, valid,
            cfg=SolverConfig(solver="ransac", pixel_thr=self.pixel_thr))
        if self.solver == "essential_metric" and depth0 is not None:
            t_m, votes, ok = metric_scale_ransac(
                est.R, est.t, p0, p1, jnp.asarray(depth0)[None],
                jnp.asarray(depth1)[None], K0j, K1j, est.inliers,
                self.scale_threshold)
            return est.R[0], t_m[0], float(est.num_inliers[0])
        return est.R[0], est.t[0], float(est.num_inliers[0])


class TorchTransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer
    defaults: ReLU FFN of 2048, norm after residual)."""

    d_model: int
    nhead: int
    dim_ff: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h, d = self.nhead, C // self.nhead
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(
            qkv.reshape(B, N, 3, h, d).transpose(2, 0, 3, 1, 4), 3, 0)
        q, k, v = q[0], k[0], v[0]
        a = jax.nn.softmax(
            (jnp.einsum("bhnd,bhmd->bhnm", q, k) * d ** -0.5
             ).astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v).transpose(0, 2, 1, 3)
        o = nn.Dense(C, dtype=self.dtype, name="proj")(o.reshape(B, N, C))
        # torch layer_norm_eps default is 1e-5 (flax default 1e-6);
        # matching it matters over 6 stacked layers
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + o)
        y = nn.relu(nn.Dense(self.dim_ff, dtype=self.dtype, name="ff1")(x))
        y = nn.Dense(C, dtype=self.dtype, name="ff2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm2")(x + y)


class MapfreeRegression(nn.Module):
    """The network part of the map-free FAR model: a pair of regressor-res
    images + the solver summary -> fused (t, 6D rot) + gate.

    The reference's regression_mlp translation handling differs from the
    mp3d EMM head: the solver t is rescaled to the regressed magnitude in
    *metric* space with clamped ratios (model.py:224-226).
    """

    cfg: SixDRegConfig

    @nn.compact
    def __call__(
        self,
        image0: jnp.ndarray,   # (B, H, W, 3) in [0, 1]
        image1: jnp.ndarray,
        solver_rt: Optional[jnp.ndarray] = None,     # (B, 3, 4)
        solver_inliers: Optional[jnp.ndarray] = None,  # (B, 3) counts
        train: bool = False,
    ):
        cfg = self.cfg
        dt = _dt(cfg)
        encoder = ResUNet(cfg, name="encoder")
        vol0 = encoder(image0, train)
        vol1 = encoder(image1, train)

        gvol = CorrelationVolumeWarping(cfg, name="aggregator")(vol0, vol1)
        _, feats = DeepResBlockHead(cfg, full_forward_pass=False,
                                    name="head")(gvol, train)
        B, Hf, Wf, C = feats.shape
        tokens = feats.reshape(B, Hf * Wf, C)

        if cfg.use_vanilla_transformer:
            for i in range(cfg.transformer_layers):
                tokens = TorchTransformerEncoderLayer(
                    cfg.d_im, cfg.transformer_heads, dtype=dt,
                    name=f"transformer_{i}")(tokens)

        features = tokens.reshape(B, -1).astype(jnp.float32)

        def mlp(inp, out, name):
            y = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name=f"{name}_0")(inp))
            y = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name=f"{name}_1")(y))
            return nn.Dense(out, dtype=dt, name=f"{name}_2")(y)

        pred_9d = mlp(features, 9, "pose_regressor").astype(jnp.float32)

        gate = None
        if cfg.use_solver_preds:
            assert solver_rt is not None and solver_inliers is not None
            from far_tpu.geometry.rotations import matrix_to_rotation_6d

            sp = jnp.concatenate(
                [solver_rt[..., :3, 3],
                 matrix_to_rotation_6d(solver_rt[..., :3, :3])], -1
            ).astype(jnp.float32)                      # (B, 9) unnormalized
            counts = solver_inliers.astype(jnp.float32) / 500.0  # (B, 3)

            # rescale solver t toward the regressed magnitude (clamped)
            ratio = jnp.linalg.norm(pred_9d[..., :3], axis=-1) / jnp.clip(
                jnp.linalg.norm(sp[..., :3], axis=-1), 1e-2, 1e2)
            ratio = jnp.clip(ratio, 1e-2, 1e2)[..., None]
            sp_t = sp[..., :3] * ratio
            sp_full = jnp.concatenate([sp_t, sp[..., 3:], counts], -1)

            gin = jnp.concatenate([features, pred_9d, sp_full], -1)
            g = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name="moe_0")(gin))
            g = nn.relu(nn.Dense(cfg.hidden, dtype=dt, name="moe_1")(g))
            gate = nn.sigmoid(nn.Dense(2, dtype=dt, name="moe_2")(g)
                              ).astype(jnp.float32)
            t = gate[..., :1] * pred_9d[..., :3] + \
                (1 - gate[..., :1]) * sp_t
            r = gate[..., 1:] * pred_9d[..., 3:] + \
                (1 - gate[..., 1:]) * sp[..., 3:]
            pred_9d = jnp.concatenate([t, r], -1)

        from far_tpu.geometry.rotations import rotation_6d_to_matrix

        R = rotation_6d_to_matrix(pred_9d[..., 3:])
        t = pred_9d[..., :3]
        return R, t, pred_9d, gate
