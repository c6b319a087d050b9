"""PyTorch checkpoint -> Flax parameter conversion for FARLoFTR.

Converts the reference's released checkpoints (crockwell/far mp3d family:
`matcher.`-prefixed LoFTR + FAR regressor state dicts) into this
framework's parameter pytree, for layer-by-layer numeric parity checks
(SURVEY.md §7 build step 3).

Layout transforms:
- Conv2d weight OIHW -> HWIO
- Linear weight (out, in) -> (in, out)
- BatchNorm weight/bias -> scale/bias (params) + running stats
  -> batch_stats {mean, var}
- LayerNorm weight -> scale
- flattened-activation Linears that consume torch CHW-ordered features
  get their input rows permuted to our HWC ordering.

The state dict can be a real torch checkpoint (torch is only imported
if needed) or any {name: np.ndarray} mapping.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv(v):
    return np.transpose(_np(v), (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(v):
    return np.transpose(_np(v), (1, 0))


def _ident(v):
    return _np(v)


def _bn_entries(src_prefix: str, dst_path: Tuple[str, ...]):
    """(param entries, batch_stats entries) for one BatchNorm."""
    params = [
        (f"{src_prefix}.weight", dst_path + ("scale",), _ident),
        (f"{src_prefix}.bias", dst_path + ("bias",), _ident),
    ]
    stats = [
        (f"{src_prefix}.running_mean", dst_path + ("mean",), _ident),
        (f"{src_prefix}.running_var", dst_path + ("var",), _ident),
    ]
    return params, stats


def _ln_entries(src_prefix: str, dst_path: Tuple[str, ...]):
    return [
        (f"{src_prefix}.weight", dst_path + ("scale",), _ident),
        (f"{src_prefix}.bias", dst_path + ("bias",), _ident),
    ]


def _lin_entries(src_prefix: str, dst_path: Tuple[str, ...],
                 bias: bool = True):
    out = [(f"{src_prefix}.weight", dst_path + ("kernel",), _linear)]
    if bias:
        out.append((f"{src_prefix}.bias", dst_path + ("bias",), _ident))
    return out


def _encoder_layer_entries(src: str, dst: Tuple[str, ...]):
    """One LoFTREncoderLayer (reference transformer.py:12-67)."""
    e = []
    for name in ("q_proj", "k_proj", "v_proj", "merge"):
        e += _lin_entries(f"{src}.{name}", dst + (name,), bias=False)
    e += _lin_entries(f"{src}.mlp.0", dst + ("mlp_0",), bias=False)
    e += _lin_entries(f"{src}.mlp.2", dst + ("mlp_1",), bias=False)
    e += _ln_entries(f"{src}.norm1", dst + ("norm1",))
    e += _ln_entries(f"{src}.norm2", dst + ("norm2",))
    return e


def _stack_entries(src: str, dst_root: Tuple[str, ...],
                   layer_names: Tuple[str, ...]):
    e = []
    for i, name in enumerate(layer_names):
        e += _encoder_layer_entries(
            f"{src}.layers.{i}", dst_root + (f"layer_{i}_{name}",))
    return e


def build_loftr_mapping(cfg) -> Tuple[list, list]:
    """(param entries, batch_stats entries) for the FARLoFTR tree.

    Entry: (torch_key, flax_path_tuple, transform).
    """
    P: List = []
    S: List = []

    # ----- backbone (ResNetFPN_8_2) ------------------------------------
    bb = ("backbone",)
    P.append(("backbone.conv1.weight", bb + ("Conv_0", "kernel"), _conv))
    p, s = _bn_entries("backbone.bn1", bb + ("_Norm_0", "BatchNorm_0"))
    P += p
    S += s
    for stage, layer in enumerate(("layer1", "layer2", "layer3")):
        for blk in range(2):
            src = f"backbone.{layer}.{blk}"
            dst = bb + (f"_Stage_{stage}", f"BasicBlock_{blk}")
            P.append((f"{src}.conv1.weight", dst + ("Conv_0", "kernel"), _conv))
            P.append((f"{src}.conv2.weight", dst + ("Conv_1", "kernel"), _conv))
            p, s = _bn_entries(f"{src}.bn1", dst + ("_Norm_0", "BatchNorm_0"))
            P += p
            S += s
            p, s = _bn_entries(f"{src}.bn2", dst + ("_Norm_1", "BatchNorm_0"))
            P += p
            S += s
            if stage > 0 and blk == 0:  # strided blocks have a downsample
                P.append((f"{src}.downsample.0.weight",
                          dst + ("Conv_2", "kernel"), _conv))
                p, s = _bn_entries(f"{src}.downsample.1",
                                   dst + ("_Norm_2", "BatchNorm_0"))
                P += p
                S += s
    # FPN: lateral 1x1s + refine stacks (order of creation: Conv_1..3)
    P.append(("backbone.layer3_outconv.weight", bb + ("Conv_1", "kernel"), _conv))
    P.append(("backbone.layer2_outconv.weight", bb + ("Conv_2", "kernel"), _conv))
    P.append(("backbone.layer1_outconv.weight", bb + ("Conv_3", "kernel"), _conv))
    for oc, src in ((0, "backbone.layer2_outconv2"),
                    (1, "backbone.layer1_outconv2")):
        dst = bb + (f"_OutConv2_{oc}",)
        P.append((f"{src}.0.weight", dst + ("Conv_0", "kernel"), _conv))
        p, s = _bn_entries(f"{src}.1", dst + ("_Norm_0", "BatchNorm_0"))
        P += p
        S += s
        P.append((f"{src}.3.weight", dst + ("Conv_1", "kernel"), _conv))

    # ----- coarse / fine transformers ----------------------------------
    P += _stack_entries("loftr_coarse", ("loftr_coarse",),
                        tuple(cfg.coarse.layer_names))
    P += _stack_entries("loftr_fine", ("fine_matching", "loftr_fine"),
                        tuple(cfg.fine.layer_names))

    # ----- fine preprocess ----------------------------------------------
    if cfg.fine.concat_coarse_feat:
        P += _lin_entries("fine_preprocess.down_proj",
                          ("fine_preprocess", "down_proj"))
        P += _lin_entries("fine_preprocess.merge_feat",
                          ("fine_preprocess", "merge_feat"))

    # ----- FAR regressor --------------------------------------------------
    if cfg.regress_rt:
        r = ("regressor",)
        src = "loftr_regress"
        P += _lin_entries(f"{src}.emm.cross_attn.qkv",
                          r + ("emm", "cross_attn", "qkv"))
        P += _lin_entries(f"{src}.emm.cross_attn.proj_fundamental",
                          r + ("emm", "cross_attn", "proj_fundamental"))
        P += _ln_entries(f"{src}.emm.norm1", r + ("emm", "norm1"))
        P += _ln_entries(f"{src}.emm.norm2", r + ("emm", "norm2"))
        P += _lin_entries(f"{src}.emm.mlp.fc1", r + ("emm", "mlp_fc1"))
        P += _lin_entries(f"{src}.emm.mlp.fc2", r + ("emm", "mlp_fc2"))
        P += _ln_entries(f"{src}.norm", r + ("norm",))
        if cfg.regress.use_simple_moe:
            P += _lin_entries(f"{src}.encoder.0", r + ("encoder_0",))
            P += _lin_entries(f"{src}.encoder.2", r + ("encoder_1",))
            P += _lin_entries(f"{src}.pose_regressor_simple_moe.0",
                              r + ("pose_moe_0",))
            P += _lin_entries(f"{src}.pose_regressor_simple_moe.2",
                              r + ("pose_moe_1",))
            P += _lin_entries(f"{src}.moe_predictor.0", r + ("moe_0",))
            P += _lin_entries(f"{src}.moe_predictor.2", r + ("moe_1",))
            P += _lin_entries(f"{src}.moe_predictor.4", r + ("moe_2",))
        else:
            P += _lin_entries(f"{src}.pose_regressor.0",
                              r + ("pose_regressor_0",))
            P += _lin_entries(f"{src}.pose_regressor.2",
                              r + ("pose_regressor_1",))
            P += _lin_entries(f"{src}.pose_regressor.4",
                              r + ("pose_regressor_2",))
        if cfg.regress.num_loftr_layers > 0:
            P += _stack_entries(
                f"{src}.loftr", r + ("loftr_extra",),
                tuple(cfg.regress.layer_names) * cfg.regress.num_loftr_layers)
    return P, S


def _set_path(tree: Dict, path: Tuple[str, ...], value: np.ndarray,
              strict_shape: bool = True) -> bool:
    node = tree
    for k in path[:-1]:
        if k not in node:
            return False
        node = node[k]
    leaf = path[-1]
    if leaf not in node:
        return False
    if strict_shape and np.shape(node[leaf]) != np.shape(value):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{np.shape(node[leaf])} vs {np.shape(value)}")
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


def convert_loftr_state_dict(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    cfg,
    strip_prefix: str = "matcher.",
):
    """Fill a FARLoFTR variables pytree from a torch state dict.

    Returns (variables, report) where report lists converted / missing /
    unused keys.
    """
    import jax

    sd = {}
    for k, v in state_dict.items():
        if k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        sd[k] = v

    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray,
                         jax.device_get(variables.get("batch_stats", {})))

    P, S = build_loftr_mapping(cfg)
    converted, missing = [], []
    used = set()
    for entries, tree in ((P, params), (S, stats)):
        for torch_key, path, tf in entries:
            if torch_key not in sd:
                missing.append(torch_key)
                continue
            if _set_path(tree, path, tf(sd[torch_key])):
                converted.append(torch_key)
                used.add(torch_key)
            else:
                missing.append(torch_key)
    unused = [k for k in sd
              if k not in used and not k.endswith("pe")  # pos-enc buffer
              and "num_batches_tracked" not in k]
    report = {"converted": converted, "missing": missing, "unused": unused}
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, report
