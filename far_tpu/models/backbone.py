"""ResNet-FPN feature backbone (NHWC, Flax).

Behavioral equivalent of crockwell/far:
mp3d_loftr/src/loftr/backbone/resnet_fpn.py (ResNetFPN_8_2 / _16_4):
grayscale input, stride-2 stem, three/four BasicBlock stages, FPN top-down
refinement; outputs a 1/8-resolution 256-d coarse map and a
1/2-resolution 128-d fine map (or 1/16 + 1/4 for the 16_4 variant).

TPU-first choices: NHWC layout (XLA's native conv layout), BatchNorm that
becomes sync-BN for free under pjit (batch reductions over a sharded
batch axis lower to cross-chip psums), optional GroupNorm for
normalization-free-of-batch training.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def _conv_out(x: jnp.ndarray) -> jnp.ndarray:
    """Tag a conv output for selective rematerialization.

    Identity outside jax.checkpoint. Under config.remat='selective' the
    backbone is wrapped with policy save_only_these_names('bb_conv'):
    conv outputs (the MXU-expensive values) stay in HBM while the
    cheap elementwise norm/relu intermediates between them are
    recomputed in the backward — every untagged value is one VPU hop
    from a tagged one, so the recompute never re-runs a conv.
    """
    return checkpoint_name(x, "bb_conv")


def resize_bilinear_align_corners(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Bilinear x2 upsample with PyTorch align_corners=True semantics.

    jax.image.resize uses half-pixel centers; FPN parity needs
    align_corners (reference resnet_fpn.py:111). Implemented as two 1-D
    interpolation matmuls, which XLA maps onto the MXU.
    """
    B, H, W, C = x.shape
    out_h, out_w = H * factor, W * factor

    def interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
        if n_in == 1:
            return jnp.ones((n_out, 1), x.dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w_hi = pos - lo
        M = jnp.zeros((n_out, n_in), jnp.float32)
        M = M.at[jnp.arange(n_out), lo].add(1.0 - w_hi)
        M = M.at[jnp.arange(n_out), hi].add(w_hi)
        return M.astype(x.dtype)

    Mh = interp_matrix(H, out_h)
    Mw = interp_matrix(W, out_w)
    x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    x = jnp.einsum("ow,bhwc->bhoc", Mw, x)
    return x


class _StemConv(nn.Module):
    """7x7/stride-2 stem conv, computed as a 4x4/stride-1 conv on the
    2x2 space-to-depth input.

    The raw stem contracts over k*k*C_in = 49 values (grayscale input) —
    pathological MXU utilization (measured 4.3 TF/s vs 80+ TF/s for the
    body convs on v5e). The space-to-depth rewrite is numerically
    identical: out(y,x) = sum_{u,v} w[u,v] in[2y+u-3, 2x+v-3] regrouped
    by the parity of u-3 and v-3 into a 4x4 kernel over 4*C_in channels
    with asymmetric padding (2,1). The parameter keeps the reference
    (7,7,C,O) shape so checkpoint conversion is unchanged.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        B, H, W, C = x.shape
        O = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, C, O),
            jnp.float32,
        )
        if H % 2 or W % 2:  # odd sizes: fall back to the direct conv
            return _conv_out(jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))

        x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

        # w2[m, n, (da*2+db)*C + c, o] = w[2m+da-1, 2n+db-1, c, o]
        w = kernel.astype(self.dtype)
        zero = jnp.zeros((C, O), self.dtype)
        rows = []
        for m in range(4):
            cols = []
            for n in range(4):
                chans = []
                for da in range(2):
                    for db in range(2):
                        u, v = 2 * m + da - 1, 2 * n + db - 1
                        chans.append(w[u, v] if 0 <= u < 7 and 0 <= v < 7
                                     else zero)
                cols.append(jnp.concatenate(chans, axis=0))  # (4C, O)
            rows.append(jnp.stack(cols))                      # (4, 4C, O)
        w2 = jnp.stack(rows)                                  # (4, 4, 4C, O)

        return _conv_out(jax.lax.conv_general_dilated(
            x2.astype(self.dtype), w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))


class _Norm(nn.Module):
    """BatchNorm or GroupNorm switch."""

    kind: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "group":
            return nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv_out(nn.Conv(self.planes, (3, 3),
                              (self.stride, self.stride), padding=1,
                              use_bias=False, dtype=self.dtype)(x))
        y = _Norm(self.norm, self.dtype)(y, train)
        y = nn.relu(y)
        y = _conv_out(nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                              dtype=self.dtype)(y))
        y = _Norm(self.norm, self.dtype)(y, train)
        if self.stride != 1:
            x = _conv_out(nn.Conv(self.planes, (1, 1),
                                  (self.stride, self.stride),
                                  use_bias=False, dtype=self.dtype)(x))
            x = _Norm(self.norm, self.dtype)(x, train)
        return nn.relu(x + y)


class _Stage(nn.Module):
    planes: int
    stride: int
    norm: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(self.planes, self.stride, self.norm, self.dtype)(x, train)
        x = BasicBlock(self.planes, 1, self.norm, self.dtype)(x, train)
        return x


class _OutConv2(nn.Module):
    """FPN lateral refinement: 3x3 -> norm -> leaky relu -> 3x3."""

    mid: int
    out: int
    norm: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv_out(nn.Conv(self.mid, (3, 3), padding=1, use_bias=False,
                              dtype=self.dtype)(x))
        x = _Norm(self.norm, self.dtype)(x, train)
        x = nn.leaky_relu(x, 0.01)
        x = _conv_out(nn.Conv(self.out, (3, 3), padding=1, use_bias=False,
                              dtype=self.dtype)(x))
        return x


class ResNetFPN_8_2(nn.Module):
    """Coarse 1/8 (block_dims[2]-d) + fine 1/2 (block_dims[0]-d) features."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.dtype
        x0 = _StemConv(self.initial_dim, dtype=d, name="Conv_0")(x)
        x0 = _Norm(self.norm, d)(x0, train)
        x0 = nn.relu(x0)

        x1 = _Stage(self.block_dims[0], 1, self.norm, d)(x0, train)   # 1/2
        x2 = _Stage(self.block_dims[1], 2, self.norm, d)(x1, train)   # 1/4
        x3 = _Stage(self.block_dims[2], 2, self.norm, d)(x2, train)   # 1/8

        # FPN top-down
        x3_out = _conv_out(nn.Conv(self.block_dims[2], (1, 1), use_bias=False,
                                   dtype=d, name="Conv_1")(x3))

        x3_up = resize_bilinear_align_corners(x3_out)
        x2_lat = _conv_out(nn.Conv(self.block_dims[2], (1, 1), use_bias=False,
                                   dtype=d, name="Conv_2")(x2))
        x2_out = _OutConv2(self.block_dims[2], self.block_dims[1], self.norm, d)(
            x2_lat + x3_up, train)

        x2_up = resize_bilinear_align_corners(x2_out)
        x1_lat = _conv_out(nn.Conv(self.block_dims[1], (1, 1), use_bias=False,
                                   dtype=d, name="Conv_3")(x1))
        x1_out = _OutConv2(self.block_dims[1], self.block_dims[0], self.norm, d)(
            x1_lat + x2_up, train)

        return x3_out, x1_out  # coarse (1/8), fine (1/2)


class ResNetFPN_16_4(nn.Module):
    """Coarse 1/16 + fine 1/4 variant (reference resnet_fpn.py:122-200)."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256, 512)
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.dtype
        x0 = _StemConv(self.initial_dim, dtype=d, name="Conv_0")(x)
        x0 = _Norm(self.norm, d)(x0, train)
        x0 = nn.relu(x0)

        x1 = _Stage(self.block_dims[0], 1, self.norm, d)(x0, train)   # 1/2
        x2 = _Stage(self.block_dims[1], 2, self.norm, d)(x1, train)   # 1/4
        x3 = _Stage(self.block_dims[2], 2, self.norm, d)(x2, train)   # 1/8
        x4 = _Stage(self.block_dims[3], 2, self.norm, d)(x3, train)   # 1/16

        x4_out = _conv_out(nn.Conv(self.block_dims[3], (1, 1), use_bias=False,
                                   dtype=d, name="Conv_1")(x4))

        x4_up = resize_bilinear_align_corners(x4_out)
        x3_lat = _conv_out(nn.Conv(self.block_dims[3], (1, 1), use_bias=False,
                                   dtype=d, name="Conv_2")(x3))
        x3_out = _OutConv2(self.block_dims[3], self.block_dims[2], self.norm, d)(
            x3_lat + x4_up, train)

        x3_up = resize_bilinear_align_corners(x3_out)
        x2_lat = _conv_out(nn.Conv(self.block_dims[2], (1, 1), use_bias=False,
                                   dtype=d, name="Conv_3")(x2))
        x2_out = _OutConv2(self.block_dims[2], self.block_dims[1], self.norm, d)(
            x2_lat + x3_up, train)

        return x4_out, x2_out  # coarse (1/16), fine (1/4)
