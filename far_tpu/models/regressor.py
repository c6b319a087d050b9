"""FAR pose regressor: epipolar bilinear attention (EMM) + MoE fusion.

Equivalent of crockwell/far:
mp3d_loftr/src/loftr/loftr_module/transformer.py:183-498
(get_positional_encodings, CrossAttention, CrossBlock,
LocalFeatureTransformerRegressor).

TPU re-design notes:
- the 6-dim epipolar basis is computed vectorized from the normalized
  intrinsics (the reference runs a python double loop over all 4800 grid
  cells at every forward — transformer.py:236-240);
- the dual-softmax bilinear form V^T (softmax_r(S) * softmax_c(S)) V is
  evaluated with a two-pass streaming scan over row blocks, so the
  (N x N) attention matrix is never materialized in HBM (flash-attention
  style; N=4800 would otherwise cost ~92MB per head pair);
- the MoE gate matches the reference 1wt/2wt/9wt variants including the
  scale_8pt translation rescaling.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.models.constants import POSE_MEAN_6D, POSE_STD_6D
from far_tpu.models.transformer import LocalFeatureTransformer
from far_tpu.utils.config import RegressConfig


@functools.lru_cache(maxsize=8)
def epipolar_positional_basis(
    h: int = 60,
    w: int = 80,
    fx: float = 517.0 / 9.0,
    fy: float = 517.0 / 8.0,
    cx: float = 40.0,
    cy: float = 30.0,
    xy_first: bool = False,
) -> np.ndarray:
    """6-dim epipolar basis per grid cell.

    (x, y) are the K^-1-normalized coordinates of the coarse grid, built
    exactly as the reference does (transformer.py:194-246) but closed
    form: with principal point at the grid center the normalization
    reduces to x = u / fx_norm, y = v / fy_norm for u, v in [-1, 1].

    ``xy_first=False`` (mp3d): [y^2, x^2, xy, y, x, 1] in row-major
    token order — the mp3d loop writes index ``j*w + k``
    (mp3d transformer.py:236-240).
    ``xy_first=True`` (8ptVit): the vendored copy writes index
    ``k*w + j`` instead (vision_transformer.py:146-150), which on its
    square grid with xs == ys amounts to the permuted basis
    [x^2, y^2, xy, x, y, 1] — the trained convention, reproduced here
    for checkpoint parity.

    Returns (h*w, 6) float32, row-major (y-major) token order.
    """
    hpix, wpix = cy * 2.0, cx * 2.0
    fx_norm = (fx / wpix) * 2.0
    fy_norm = (fy / hpix) * 2.0

    us = np.linspace(-1.0, 1.0, w, dtype=np.float32)
    vs = np.linspace(-1.0, 1.0, h, dtype=np.float32)
    x = np.tile(us[None, :], (h, 1)) / fx_norm   # (h, w)
    y = np.tile(vs[:, None], (1, w)) / fy_norm

    if xy_first:
        feats = [x * x, y * y, x * y, x, y, np.ones_like(x)]
    else:
        feats = [y * y, x * x, x * y, y, x, np.ones_like(x)]
    basis = np.stack(feats, axis=-1).reshape(h * w, 6)
    return basis.astype(np.float32)


def _dual_softmax_bilinear(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """F = sum_{n,m} A[n,m] v[n] (x) v[m], A = rowsoft(S)*colsoft(S).

    Dispatches to the fused Pallas kernel on TPU (far_tpu.ops), which
    streams S in row blocks and never materializes the (N, N) attention;
    falls back to a materializing jnp version for small N / CPU.
    """
    from far_tpu.ops.bilinear_attention import bilinear_dual_softmax

    return bilinear_dual_softmax(q, k, v, scale)


class CrossAttentionEMM(nn.Module):
    """Epipolar bilinear cross-attention producing 'fundamental' features.

    Equivalent of crockwell/far: transformer.py:250-303 (CrossAttention).
    """

    dim: int
    num_heads: int
    grid_hw: Tuple[int, int] = (60, 80)
    grid_f: Tuple[float, float] = (517.0 / 9.0, 517.0 / 8.0)  # (fx, fy)
    basis_xy_first: bool = False   # True for the 8ptVit basis variant
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray):
        B, N, C = x1.shape
        H = self.num_heads
        D = C // H
        scale = D ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")

        def split(x):
            t = qkv(x).reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
            return t[0], t[1], t[2]  # each (B, H, N, D)

        q1, k1, v1 = split(x1)
        q2, k2, v2 = split(x2)

        h, w = self.grid_hw
        fx, fy = self.grid_f
        pos = jnp.asarray(
            epipolar_positional_basis(h, w, fx, fy, w / 2.0, h / 2.0,
                                      xy_first=self.basis_xy_first),
            self.dtype,
        )  # (N, 6)
        pos = jnp.broadcast_to(pos[None, None], (B, H, N, 6))
        v1p = jnp.concatenate([v1, pos], axis=-1)  # (B, H, N, D+6)
        v2p = jnp.concatenate([v2, pos], axis=-1)

        # attn_1 rows are image-2 queries over image-1 keys (and v1);
        # attn_2 the reverse — reference wiring at transformer.py:275-292.
        f1 = _dual_softmax_bilinear(q2, k1, v1p, scale)  # (B, H, D+6, D+6)
        f2 = _dual_softmax_bilinear(q1, k2, v2p, scale)

        Dv = D + 6
        proj_fundamental = nn.Dense(self.dim, dtype=self.dtype,
                                    name="proj_fundamental")

        def proj(fh):
            # (B, H, Dv, Dv) -> (B, H*Dv, Dv) -> (B, Dv, H*Dv) -> Dense
            fh = fh.astype(self.dtype).reshape(B, H * Dv, Dv)
            fh = jnp.swapaxes(fh, -1, -2)
            return proj_fundamental(fh)  # (B, Dv, C)

        # returned flipped, as in the reference ("x1 gets (q1 k2) v2")
        return proj(f2), proj(f1)


class CrossBlockEMM(nn.Module):
    """Norm + EMM cross-attention + MLP residual (reference CrossBlock)."""

    dim: int
    num_heads: int
    grid_hw: Tuple[int, int] = (60, 80)
    grid_f: Tuple[float, float] = (517.0 / 9.0, 517.0 / 8.0)
    use_pos_embedding: bool = False
    mlp_ratio: float = 4.0
    # mp3d CrossBlock norms are torch-default eps 1e-5
    # (transformer.py:305-316); the 8ptVit variant inherits timm's 1e-6
    # (vision_transformer.py:324) — ViTEss overrides this field.
    ln_eps: float = 1e-5
    basis_xy_first: bool = False   # True for the 8ptVit basis variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat0: jnp.ndarray, feat1: jnp.ndarray):
        B, N, C = feat0.shape
        if self.use_pos_embedding:
            pe = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, N, C),
                jnp.float32,
            ).astype(self.dtype)
            feat0 = feat0 + pe
            feat1 = feat1 + pe

        norm1 = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                             name="norm1")
        f1, f2 = CrossAttentionEMM(
            dim=self.dim, num_heads=self.num_heads, grid_hw=self.grid_hw,
            grid_f=self.grid_f, basis_xy_first=self.basis_xy_first,
            dtype=self.dtype, name="cross_attn",
        )(norm1(feat0), norm1(feat1))

        fund = jnp.concatenate([f1, f2], axis=1)  # (B, 2*Dv, C)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm2")(fund)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default: exact erf
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return fund + y  # (B, 2*Dv, C)


class PoseRegressorEMM(nn.Module):
    """LocalFeatureTransformerRegressor: EMM + encoder + MoE gating.

    Equivalent of crockwell/far: transformer.py:350-498. Inputs are the
    transformed coarse features of both images plus the solver-pose
    summary; output is a normalized 9D pose and the gate weights.
    """

    cfg: RegressConfig
    grid_hw: Tuple[int, int] = (60, 80)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        if cfg.num_loftr_layers > 0:
            self.loftr_extra = LocalFeatureTransformer(
                d_model=cfg.d_model, nhead=cfg.nhead_stack,
                layer_names=tuple(cfg.layer_names) * cfg.num_loftr_layers,
                attention=cfg.attention, dtype=self.dtype,
            )
        self.emm = CrossBlockEMM(
            dim=cfg.d_model, num_heads=cfg.emm_heads, grid_hw=self.grid_hw,
            grid_f=(cfg.grid_fx, cfg.grid_fy),
            use_pos_embedding=cfg.use_pos_embedding, dtype=self.dtype,
        )
        self.norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-6)
        hidden = cfg.hidden
        dense = lambda n, name: nn.Dense(n, dtype=self.dtype, name=name)
        if cfg.use_simple_moe:
            self.encoder_0 = dense(hidden, "encoder_0")
            self.encoder_1 = dense(hidden, "encoder_1")
            self.pose_moe_0 = dense(hidden, "pose_moe_0")
            self.pose_moe_1 = dense(9, "pose_moe_1")
            if cfg.use_1wt:
                n_wt = 1
            elif cfg.use_2wt:
                n_wt = 2
            else:
                n_wt = 9
            self.moe_0 = dense(hidden, "moe_0")
            self.moe_1 = dense(hidden, "moe_1")
            self.moe_2 = dense(n_wt, "moe_2")
        else:
            self.pose_regressor_0 = dense(hidden, "pose_regressor_0")
            self.pose_regressor_1 = dense(hidden, "pose_regressor_1")
            self.pose_regressor_2 = dense(9, "pose_regressor_2")

    def features_only(self, feat0: jnp.ndarray, feat1: jnp.ndarray):
        """EMM bilinear features, flattened — independent of the solver."""
        B = feat0.shape[0]
        if self.cfg.num_loftr_layers > 0:
            feat0, feat1 = self.loftr_extra(feat0, feat1)
        x = self.emm(feat0, feat1)  # (B, 2*Dv, C)
        x = self.norm(x)
        return x.reshape(B, -1)     # (B, 2*Dv*C) == reference H

    def fuse(self, features: jnp.ndarray,
             solver_pose_in: Optional[jnp.ndarray] = None):
        """Pose regression + MoE gating given precomputed features."""
        cfg = self.cfg

        if not cfg.use_simple_moe:
            y = nn.relu(self.pose_regressor_0(features))
            y = nn.relu(self.pose_regressor_1(y))
            pose = self.pose_regressor_2(y)
            return pose.astype(jnp.float32), None, features

        enc = nn.relu(self.encoder_0(features))
        enc = self.encoder_1(enc)
        reg = nn.relu(self.pose_moe_0(enc))
        pred_reg_9d = self.pose_moe_1(reg).astype(jnp.float32)

        assert solver_pose_in is not None, "MoE path needs the solver pose"
        sp = solver_pose_in.astype(jnp.float32)  # (B, 9 + extras)

        reg_t = pred_reg_9d[..., :3]
        solver_t = sp[..., :3]
        solver_rot = sp[..., 3:9]

        if cfg.scale_8pt:
            # rescale the (unit-norm) solver translation to the regressed
            # magnitude, in unnormalized space (reference transformer.py:437-446)
            mean_t, std_t = POSE_MEAN_6D[:3], POSE_STD_6D[:3]
            solver_t_un = solver_t * std_t + mean_t
            reg_t_un = reg_t * std_t + mean_t
            norm_reg = jnp.linalg.norm(reg_t_un, axis=-1, keepdims=True)
            norm_sol = jnp.clip(
                jnp.linalg.norm(solver_t_un, axis=-1, keepdims=True),
                1e-3, 100.0)
            solver_t = (solver_t_un * norm_reg / norm_sol - mean_t) / std_t

        gate_in = jnp.concatenate([features.astype(jnp.float32),
                                   pred_reg_9d, sp], axis=-1)
        g = nn.relu(self.moe_0(gate_in))
        g = nn.relu(self.moe_1(g))
        gate = nn.sigmoid(self.moe_2(g)).astype(jnp.float32)

        if cfg.use_2wt:
            w_t = gate[..., 0:1]
            w_r = gate[..., 1:2]
        elif cfg.use_1wt:
            w_t = w_r = gate[..., 0:1]
        else:
            w_t = gate[..., :3]
            w_r = gate[..., 3:]

        pred_t = w_t * reg_t + (1.0 - w_t) * solver_t
        pred_r = w_r * pred_reg_9d[..., 3:] + (1.0 - w_r) * solver_rot
        pose = jnp.concatenate([pred_t, pred_r], axis=-1)
        return pose, gate, features

    def __call__(
        self,
        feat0: jnp.ndarray,            # (B, N, C)
        feat1: jnp.ndarray,
        solver_pose_in: Optional[jnp.ndarray] = None,  # (B, 9 + extras)
        inv_solver_pose_in: Optional[jnp.ndarray] = None,
    ):
        features = self.features_only(feat0, feat1)
        return self.fuse(features, solver_pose_in)
