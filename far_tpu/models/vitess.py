"""ViTEss: the 8-Point ViT relative rotation model (Flax).

Equivalent of crockwell/far: interiornetStreetlearn_8ptVit/src/model.py
(ViTEss) + src/modules/vision_transformer.py: ResNet18 trunk to layer2,
a RAFT-style residual block down to 24x24x192 tokens, a ViT-tiny stack
(depth 6, 3 heads) whose final block is the epipolar bilinear CrossBlock
(shared with the FAR EMM regressor, far_tpu.models.regressor), a pose
MLP emitting 9D (t + ortho-6D rotation), and the optional LoFTR-gating
MoE head.

TPU-first notes: NHWC, bf16 compute, and the CrossBlock reuses the fused
Pallas dual-softmax bilinear kernel. The epipolar basis for the 24x24
token grid reduces to the identity-normalized case (principal point at
the grid center), computed closed-form instead of the reference's
python double loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.models.regressor import CrossBlockEMM

# Per-dataset 9D pose normalization constants (reference
# interiornetStreetlearn_8ptVit/train.py:148-164). Host numpy on purpose
# (see far_tpu.models.constants).
VITESS_POSE_STATS = {
    "matterport": (
        np.array([-0.06979753, 0.03417105, -0.17588863, 0.50275223,
                  0.03533648, -0.18179045, -0.03533648, 0.98189617,
                  0.09313615], np.float32),
        np.array([0.38802881, 0.07354026, 0.37663504, 0.51837117,
                  0.12717603, 0.65426397, 0.12717603, 0.0188729,
                  0.09709263], np.float32),
    ),
    "interiornet_T": (
        np.array([0, 0, 0, 0.92456496, -0.00201821, -0.00987212,
                  -0.00019313, 0.72139406, -0.00184757], np.float32),
        np.array([1, 1, 1, 0.07689704, 0.17564303, 0.32912105,
                  0.1753406, 0.27482772, 0.6109926], np.float32),
    ),
    "interiornet": (
        np.array([0, 0, 0, 0.9275364, -0.00368287, -0.00655767,
                  0.00045095, 0.7385428, -0.00683342], np.float32),
        np.array([1, 1, 1, 0.07534314, 0.1704135, 0.32389316,
                  0.17006727, 0.27120626, 0.5933235], np.float32),
    ),
    "streetlearn_T": (
        np.array([0, 0, 0, 0.828742, 0.00034936, -0.00100069,
                  -0.00250733, 0.7001684, -0.00283758], np.float32),
        np.array([1, 1, 1, 0.16392577, 0.2663457, 0.46407992,
                  0.26599622, 0.27905113, 0.60093635], np.float32),
    ),
    "streetlearn": (
        np.array([0, 0, 0, 0.8217494, -0.0019066, -0.00003673,
                  -0.00000574, 0.697334, -0.00272899], np.float32),
        np.array([1, 1, 1, 0.16815728, 0.27100316, 0.47223347,
                  0.27088866, 0.2769559, 0.60302496], np.float32),
    ),
}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTEssConfig:
    dim: int = 192
    depth: int = 6                 # last block is the CrossBlock
    num_heads: int = 3
    feature_hw: Tuple[int, int] = (24, 24)
    fc_hidden: int = 512
    # Epipolar-basis focals in grid cells. The reference builds the basis
    # from per-batch intrinsics (vision_transformer.py:90-140) after
    # asserting they are constant; for InteriorNet/StreetLearn
    # (fx=320, fy=240 at 640x480) the normalized focal is exactly 1.0,
    # i.e. fx_grid = w/2 = 12 on the 24x24 token grid.
    grid_fx: float = 12.0
    grid_fy: float = 12.0
    fusion_transformer: bool = True
    pool_size: int = 60            # non-transformer pooling path
    use_loftr_gating: bool = False
    use_normalized_6d: bool = True
    dataset: str = "interiornet_T"
    dtype: str = "bfloat16"


class TorchvisionBasicBlock(nn.Module):
    """torchvision-style ResNet BasicBlock (conv-bn-relu-conv-bn + skip)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype, name=n)
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down")(x)
            x = bn("bn_down")(x)
        return nn.relu(x + y)


class ResNet18Trunk(nn.Module):
    """ResNet18 through layer2 (224x224 -> 28x28x128), reference
    model.py:147-152."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            x = TorchvisionBasicBlock(64, dtype=self.dtype,
                                      name=f"layer1_{i}")(x, train)
        x = TorchvisionBasicBlock(128, stride=2, dtype=self.dtype,
                                  name="layer2_0")(x, train)
        x = TorchvisionBasicBlock(128, dtype=self.dtype,
                                  name="layer2_1")(x, train)
        return x


class RaftResidualBlock(nn.Module):
    """RAFT-style residual block with a valid (no-pad) kxk second conv
    that shrinks 28x28 -> 24x24 (reference extractor.py:5-66,
    kernel_size=5, batch norm)."""

    planes: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype, name=n)
        k = self.kernel_size
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("norm1")(y))
        y = nn.Conv(self.planes, (k, k), padding="VALID", dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(bn("norm2")(y))
        d = nn.Conv(self.planes, (k, k), padding="VALID", dtype=self.dtype,
                    name="down")(x)
        d = bn("norm3")(d)
        return nn.relu(d + y)


class ViTSelfBlock(nn.Module):
    """Standard pre-norm ViT block (timm-style), reference
    vision_transformer.py:265-283."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype,
                       name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, d)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # (B, h, N, d)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (d ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, dtype=self.dtype, name="proj")(o)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default: exact erf
        y = nn.Dense(C, dtype=self.dtype, name="fc2")(y)
        return x + y


class ViTEss(nn.Module):
    """8-Point ViT pose regressor."""

    config: ViTEssConfig

    def _stats(self):
        return VITESS_POSE_STATS[self.config.dataset]

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,               # (B, 2, H, W, 3), RGB in [0, 1]
        solver_pose: Optional[jnp.ndarray] = None,  # (B, 3, 4) gating input
        solver_num_corr: Optional[jnp.ndarray] = None,  # (B,)
        train: bool = False,
    ):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        B = images.shape[0]
        fh, fw = cfg.feature_hw
        N = fh * fw

        x = (images - _IMAGENET_MEAN) / _IMAGENET_STD
        x = x.reshape(B * 2, *images.shape[2:])
        # torch-convention nearest resize to 224 (reference model.py:144
        # F.interpolate(size=224), default mode='nearest': src index =
        # floor(dst * in/out)) — a gather, checkpoint-parity exact
        H_in, W_in = x.shape[1], x.shape[2]
        if (H_in, W_in) != (224, 224):
            iy = jnp.floor(jnp.arange(224) * (H_in / 224)).astype(jnp.int32)
            ix = jnp.floor(jnp.arange(224) * (W_in / 224)).astype(jnp.int32)
            x = x[:, iy][:, :, ix]
        x = x.astype(dt)

        x = ResNet18Trunk(dtype=dt, name="resnet")(x, train)       # 28x28x128
        k = max(1, 28 - fh + 1)
        x = RaftResidualBlock(cfg.dim, k, dtype=dt,
                              name="extractor_final_conv")(x, train)  # 24x24x192
        tokens = x.reshape(B * 2, N, cfg.dim)

        if cfg.fusion_transformer:
            pos = self.param(
                "pos_embed", nn.initializers.xavier_uniform(),
                (1, N, cfg.dim), jnp.float32,
            ).astype(dt)
            tokens = tokens + pos
            for i in range(cfg.depth - 1):
                tokens = ViTSelfBlock(cfg.dim, cfg.num_heads, dtype=dt,
                                      name=f"block_{i}")(tokens)
            feat0 = tokens.reshape(B, 2, N, cfg.dim)[:, 0]
            feat1 = tokens.reshape(B, 2, N, cfg.dim)[:, 1]
            fused = CrossBlockEMM(
                dim=cfg.dim, num_heads=cfg.num_heads,
                grid_hw=cfg.feature_hw,
                grid_f=(cfg.grid_fx, cfg.grid_fy),
                ln_eps=1e-6,  # timm norm_layer eps (vision_transformer.py:324)
                basis_xy_first=True,  # 8ptVit basis (regressor.py docstring)
                dtype=dt, name="cross_block",
            )(feat0, feat1)                                  # (B, 2*Dv, C)
            fused = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="norm")(fused)
            features = fused.reshape(B, -1)
        else:
            # pooling path (reference model.py:84-91)
            x = tokens.reshape(B * 2, fh, fw, cfg.dim)
            p1 = min(96, 4 * cfg.pool_size)
            x = nn.Conv(p1, (1, 1), dtype=dt, name="pool1")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="pool_bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(cfg.pool_size, (1, 1), dtype=dt, name="pool2")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="pool_bn2")(x)
            features = x.reshape(B, -1)

        def mlp_head(inp, name):
            y = nn.Dense(cfg.fc_hidden, dtype=dt, name=f"{name}_0")(inp)
            y = nn.relu(y)
            y = nn.Dense(cfg.fc_hidden, dtype=dt, name=f"{name}_1")(y)
            y = nn.relu(y)
            return nn.Dense(9, dtype=dt, name=f"{name}_2")(y)

        pred_9d = mlp_head(features, "pose_regressor").astype(jnp.float32)

        gate = None
        if cfg.use_loftr_gating:
            assert solver_pose is not None and solver_num_corr is not None
            mean, std = self._stats()
            from far_tpu.geometry.rotations import matrix_to_rotation_6d

            six = matrix_to_rotation_6d(solver_pose[..., :3, :3])
            raw = jnp.concatenate([solver_pose[..., :3, 3], six], -1)
            if cfg.use_normalized_6d:
                raw = (raw - mean) / std
            sp = jnp.concatenate(
                [raw, solver_num_corr[..., None] / 500.0], -1
            ).astype(jnp.float32)

            gin = jnp.concatenate(
                [features.astype(jnp.float32), pred_9d, sp], -1)
            g = nn.Dense(cfg.fc_hidden, dtype=dt, name="moe_0")(gin)
            g = nn.relu(g)
            g = nn.Dense(cfg.fc_hidden, dtype=dt, name="moe_1")(g)
            g = nn.relu(g)
            gate = nn.sigmoid(
                nn.Dense(2, dtype=dt, name="moe_2")(g)).astype(jnp.float32)
            pred_t = gate[..., :1] * pred_9d[..., :3] + \
                (1 - gate[..., :1]) * sp[..., :3]
            pred_r = gate[..., 1:] * pred_9d[..., 3:] + \
                (1 - gate[..., 1:]) * sp[..., 3:9]
            pred_9d = jnp.concatenate([pred_t, pred_r], -1)

        # un-normalize + rotation matrix (reference model.py:205-217;
        # the decode is RotationContinuity's COLUMN convention, unlike
        # the row-convention GT/input encodings — see rotations.py)
        mean, std = self._stats()
        from far_tpu.geometry.rotations import ortho6d_to_matrix_rc

        if cfg.use_normalized_6d:
            un = pred_9d * std + mean
        else:
            un = pred_9d
        tran = un[..., :3]
        R = ortho6d_to_matrix_rc(un[..., 3:])
        return tran, R, pred_9d, gate
