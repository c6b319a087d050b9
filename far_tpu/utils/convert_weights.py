"""PyTorch checkpoint -> Flax parameter conversion, all three families.

Converts the reference's released checkpoints into this framework's
parameter pytrees, for layer-by-layer numeric parity checks
(SURVEY.md §7 build step 3):
- FARLoFTR  <- crockwell/far mp3d family (`matcher.`-prefixed LoFTR +
  FAR regressor state dicts, mp3d_loftr/src/loftr/**)
- ViTEss    <- interiornetStreetlearn_8ptVit family
  (src/model.py: resnet18 trunk + fusion_transformer + MoE heads)
- MapfreeRegression <- mapfree_6dreg family
  (lib/models/regression/model.py: encoder/aggregator/head +
  vanilla TransformerEncoder + pose/moe MLPs)

Layout transforms:
- Conv2d weight OIHW -> HWIO
- Linear weight (out, in) -> (in, out)
- torch MultiheadAttention in_proj (3C, C) -> (C, 3C) qkv kernel
- BatchNorm weight/bias -> scale/bias (params) + running stats
  -> batch_stats {mean, var}
- LayerNorm weight -> scale
- flattened-activation Linears that consume torch CHW-ordered features
  get their input rows permuted to our HWC/token-major ordering.

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


def _perm_linear(C: int, n_extra: int = 0, n_blocks: int = 1):
    """Linear transform for torch Linears whose flattened input is
    CHW-ordered (row index c*HW + s) while our flatten is token-major
    (s*C + c). ``n_blocks`` leading same-size blocks (e.g. the two
    images of a pair) are permuted independently; ``n_extra`` trailing
    rows (appended pose / gating features) pass through unchanged.
    HW is inferred from the weight shape."""

    def tf(v):
        w = _linear(v)  # (in, out)
        hw = (w.shape[0] - n_extra) // (n_blocks * C)
        if hw * n_blocks * C + n_extra != w.shape[0]:
            raise ValueError(
                f"cannot factor input dim {w.shape[0]} as "
                f"{n_blocks}*{C}*HW + {n_extra}")
        s = np.arange(hw)
        c = np.arange(C)
        base = (c[None, :] * hw + s[:, None]).reshape(-1)
        perm = np.concatenate([base + b * C * hw for b in range(n_blocks)])
        return np.concatenate([w[perm], w[C * hw * n_blocks:]], axis=0)

    tf.__name__ = "_linear"  # torch-side shape matches a plain Linear
    return tf


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
        if cfg.regress.use_pos_embedding:
            # CrossBlock pos_embed (reference transformer.py:305-349,
            # live in the production FAR config via --use_pos_embedding)
            P.append((f"{src}.emm.pos_embed",
                      r + ("emm", "pos_embed"), _ident))
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


def build_vitess_mapping(cfg) -> Tuple[list, list]:
    """(param entries, batch_stats entries) for the ViTEss tree.

    Source names follow interiornetStreetlearn_8ptVit/src/model.py
    (torchvision resnet18 trunk, RAFT ResidualBlock, timm ViT blocks with
    a final CrossBlock, pose/moe MLP heads). resnet.layer3/layer4/fc are
    present in released checkpoints but unused (trunk stops at layer2).
    """
    P: List = []
    S: List = []

    def bn(src, dst):
        p, s = _bn_entries(src, dst)
        P.extend(p)
        S.extend(s)

    # ----- resnet18 trunk (through layer2) ------------------------------
    P.append(("resnet.conv1.weight", ("resnet", "conv1", "kernel"), _conv))
    bn("resnet.bn1", ("resnet", "bn1"))
    for layer in ("layer1", "layer2"):
        for b in range(2):
            src = f"resnet.{layer}.{b}"
            dst = ("resnet", f"{layer}_{b}")
            P.append((f"{src}.conv1.weight", dst + ("conv1", "kernel"), _conv))
            P.append((f"{src}.conv2.weight", dst + ("conv2", "kernel"), _conv))
            bn(f"{src}.bn1", dst + ("bn1",))
            bn(f"{src}.bn2", dst + ("bn2",))
            if layer == "layer2" and b == 0:
                P.append((f"{src}.downsample.0.weight",
                          dst + ("down", "kernel"), _conv))
                bn(f"{src}.downsample.1", dst + ("bn_down",))

    # ----- RAFT residual block (extractor.py:5-49, kernel 5, batch) -----
    e = ("extractor_final_conv",)
    for c in ("conv1", "conv2"):
        P.append((f"extractor_final_conv.{c}.weight",
                  e + (c, "kernel"), _conv))
        P.append((f"extractor_final_conv.{c}.bias", e + (c, "bias"), _ident))
    bn("extractor_final_conv.norm1", e + ("norm1",))
    bn("extractor_final_conv.norm2", e + ("norm2",))
    P.append(("extractor_final_conv.downsample.0.weight",
              e + ("down", "kernel"), _conv))
    P.append(("extractor_final_conv.downsample.0.bias",
              e + ("down", "bias"), _ident))
    bn("extractor_final_conv.norm3", e + ("norm3",))

    if cfg.fusion_transformer:
        P.append(("fusion_transformer.pos_embed", ("pos_embed",), _ident))
        for i in range(cfg.depth - 1):
            src = f"fusion_transformer.blocks.{i}"
            dst = (f"block_{i}",)
            P += _ln_entries(f"{src}.norm1", dst + ("norm1",))
            P += _lin_entries(f"{src}.attn.qkv", dst + ("qkv",))
            P += _lin_entries(f"{src}.attn.proj", dst + ("proj",))
            P += _ln_entries(f"{src}.norm2", dst + ("norm2",))
            P += _lin_entries(f"{src}.mlp.fc1", dst + ("fc1",))
            P += _lin_entries(f"{src}.mlp.fc2", dst + ("fc2",))
        src = f"fusion_transformer.blocks.{cfg.depth - 1}"  # CrossBlock
        dst = ("cross_block",)
        P += _ln_entries(f"{src}.norm1", dst + ("norm1",))
        P += _lin_entries(f"{src}.cross_attn.qkv",
                          dst + ("cross_attn", "qkv"))
        P += _lin_entries(f"{src}.cross_attn.proj_fundamental",
                          dst + ("cross_attn", "proj_fundamental"))
        P += _ln_entries(f"{src}.norm2", dst + ("norm2",))
        P += _lin_entries(f"{src}.mlp.fc1", dst + ("mlp_fc1",))
        P += _lin_entries(f"{src}.mlp.fc2", dst + ("mlp_fc2",))
        P += _ln_entries("fusion_transformer.norm", ("norm",))
        # transformer features flatten token-major on both sides
        head_tf = _linear
    else:
        # pooling path (model.py:84-91): features flatten CHW per image
        P.append(("pool_transformer_output.0.weight",
                  ("pool1", "kernel"), _conv))
        P.append(("pool_transformer_output.0.bias",
                  ("pool1", "bias"), _ident))
        bn("pool_transformer_output.1", ("pool_bn1",))
        P.append(("pool_transformer_output.3.weight",
                  ("pool2", "kernel"), _conv))
        P.append(("pool_transformer_output.3.bias",
                  ("pool2", "bias"), _ident))
        bn("pool_transformer_output.4", ("pool_bn2",))
        head_tf = None  # built per consumer below (n_extra differs)

    def head_entries(src, dst_fmt, n_extra):
        first_tf = head_tf or _perm_linear(cfg.pool_size, n_extra=n_extra,
                                           n_blocks=2)
        out = []
        for i, j in ((0, 0), (2, 1), (4, 2)):
            out += [(f"{src}.{i}.weight", (dst_fmt.format(j), "kernel"),
                     first_tf if i == 0 else _linear),
                    (f"{src}.{i}.bias", (dst_fmt.format(j), "bias"), _ident)]
        return out

    P += head_entries("pose_regressor", "pose_regressor_{}", 0)
    if cfg.use_loftr_gating:
        # moe input = [features, pred 9D, solver 9D + corr count]
        P += head_entries("moe_predictor", "moe_{}", 19)
    return P, S


def build_sixdreg_mapping(cfg) -> Tuple[list, list]:
    """(param entries, batch_stats entries) for MapfreeRegression.

    Source names follow mapfree_6dreg/lib/models/regression/**
    (ResUNet encoder, parameter-free CorrelationVolumeWarping aggregator,
    DeepResBlock head trunk, torch TransformerEncoder, pose/moe MLPs).
    Not mapped on purpose: `matcher.*` (the frozen LoFTR submodule —
    convert with build_loftr_mapping into the matcher's own tree),
    `s_r`/`s_t` (Kendall-Cipolla loss weights, trainer state, not model
    params), and `head.resblock4/mlp` (only built when
    full_forward_pass=True, the non-FAR configurations).
    """
    P: List = []
    S: List = []

    def bn(src, dst):
        p, s = _bn_entries(src, dst)
        P.extend(p)
        S.extend(s)

    def preact(src, dst, has_shortcut, n_convs: int = 2):
        for c in range(1, n_convs + 1):
            bn(f"{src}.bn{c}", dst + (f"bn{c}",))
            P.append((f"{src}.conv{c}.weight",
                      dst + (f"conv{c}", "kernel"), _conv))
        if has_shortcut:
            P.append((f"{src}.shortcut.0.weight",
                      dst + ("shortcut", "kernel"), _conv))

    # ----- ResUNet encoder (resunet.py:41-128) --------------------------
    # BLOCK_TYPE selects PreActBlock (exp 1) / PreActBottleneck (exp 4)
    exp = 4 if cfg.encoder_bottleneck else 1
    n_convs = 3 if cfg.encoder_bottleneck else 2
    enc = ("encoder",)
    P.append(("encoder.firstconv.weight", enc + ("firstconv", "kernel"),
              _conv))
    bn("encoder.firstbn", enc + ("firstbn",))
    in_planes = 64
    for si, (name, planes, stride) in enumerate(
            (("encoder1", 64, 1), ("encoder2", 128, 2),
             ("encoder3", 256, 2))):
        for b in range(cfg.encoder_blocks[si]):
            st = stride if b == 0 else 1
            preact(f"encoder.{name}.{b}", enc + (f"{name}_{b}",),
                   has_shortcut=(st != 1 or in_planes != planes * exp),
                   n_convs=n_convs)
            in_planes = planes * exp
    # decoder conv+bn pairs (the `conv`/`upconv` helpers, resunet.py:15-38)
    for ours, theirs in (("upconv4", "upconv4.conv1"), ("iconv4", "iconv4"),
                         ("upconv3", "upconv3.conv1"), ("iconv3", "iconv3"),
                         ("outconv", "outconv")):
        dst = enc + (ours,)
        P.append((f"encoder.{theirs}.conv.weight",
                  dst + ("Conv_0", "kernel"), _conv))
        P.append((f"encoder.{theirs}.conv.bias",
                  dst + ("Conv_0", "bias"), _ident))
        bn(f"encoder.{theirs}.normalize", dst + ("BatchNorm_0",))

    # aggregator: CorrelationVolumeWarping carries no parameters in the
    # FAR configuration (CV_OUTLAYERS=0, UPSAMPLE_POS_ENC=0, no dustbin)

    # ----- head trunk (head.py:27-49, full_forward_pass=False;
    # plain PreActBlocks, stride 2, channel count changes every block) --
    for b in (1, 2, 3):
        preact(f"head.resblock{b}", ("head", f"resblock{b}"),
               has_shortcut=True, n_convs=2)

    # ----- vanilla TransformerEncoder (torch module names) --------------
    if cfg.use_vanilla_transformer:
        for i in range(cfg.transformer_layers):
            src = f"transformer.layers.{i}"
            dst = (f"transformer_{i}",)
            P.append((f"{src}.self_attn.in_proj_weight",
                      dst + ("qkv", "kernel"), _linear))
            P.append((f"{src}.self_attn.in_proj_bias",
                      dst + ("qkv", "bias"), _ident))
            P += _lin_entries(f"{src}.self_attn.out_proj", dst + ("proj",))
            P += _lin_entries(f"{src}.linear1", dst + ("ff1",))
            P += _lin_entries(f"{src}.linear2", dst + ("ff2",))
            P += _ln_entries(f"{src}.norm1", dst + ("norm1",))
            P += _ln_entries(f"{src}.norm2", dst + ("norm2",))

    # ----- pose / moe MLPs (CHW-flattened feature input) ----------------
    def head_entries(src, dst_fmt, n_extra):
        out = []
        for i, j in ((0, 0), (2, 1), (4, 2)):
            tf = _perm_linear(cfg.d_im, n_extra=n_extra) if i == 0 \
                else _linear
            out += [(f"{src}.{i}.weight", (dst_fmt.format(j), "kernel"), tf),
                    (f"{src}.{i}.bias", (dst_fmt.format(j), "bias"), _ident)]
        return out

    P += head_entries("pose_regressor", "pose_regressor_{}", 0)
    if cfg.use_solver_preds:
        # moe input = [features, pred 9D, solver 9D + 3 inlier counts]
        P += head_entries("moe_predictor", "moe_{}", 21)
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


def _apply_mapping(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    P: list,
    S: list,
    strip_prefix: str = "",
    unused_ok=lambda k: False,
):
    """Fill a Flax variables pytree from a torch state dict via a
    (param entries, batch_stats entries) mapping.

    Returns (variables, report) where report lists converted / missing /
    unused keys. ``unused_ok(key)`` marks source keys that are expected
    to be left behind (frozen submodules, buffers, unused tails).
    """
    import jax

    sd = {}
    for k, v in state_dict.items():
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        sd[k] = v

    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray,
                         jax.device_get(variables.get("batch_stats", {})))

    converted, missing = [], []
    used = set()
    for entries, tree in ((P, params), (S, stats)):
        for torch_key, path, tf in entries:
            # a tuple source pulls several torch tensors into one leaf
            # (e.g. folding an eval-mode BatchNorm into a conv)
            keys = torch_key if isinstance(torch_key, tuple) else (torch_key,)
            if any(k not in sd for k in keys):
                missing.extend(k for k in keys if k not in sd)
                continue
            vals = [sd[k] for k in keys]
            value = tf(*vals) if isinstance(torch_key, tuple) else tf(vals[0])
            if _set_path(tree, path, value):
                converted.extend(keys)
                used.update(keys)
            else:
                missing.extend(keys)
    unused = [k for k in sd
              if k not in used and "num_batches_tracked" not in k
              and not unused_ok(k)]
    report = {"converted": converted, "missing": missing, "unused": unused}
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, report


def convert_loftr_state_dict(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    cfg,
    strip_prefix: str = "matcher.",
):
    """Fill a FARLoFTR variables pytree from a torch state dict
    (crockwell/far mp3d family, `matcher.`-prefixed)."""
    P, S = build_loftr_mapping(cfg)
    return _apply_mapping(
        state_dict, variables, P, S, strip_prefix=strip_prefix,
        unused_ok=lambda k: k.endswith("pe"),  # pos-enc buffer
    )


def convert_vitess_state_dict(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    cfg,
    strip_prefix: str = "module.",
):
    """Fill a ViTEss variables pytree from a torch state dict
    (interiornetStreetlearn_8ptVit checkpoints; DDP `module.` prefix).

    Expected-unused source keys: resnet.layer3/layer4/fc (the trunk
    stops at layer2, model.py:147-152) and the duplicate registration of
    the extractor's norm3 under downsample.1."""
    P, S = build_vitess_mapping(cfg)
    return _apply_mapping(
        state_dict, variables, P, S, strip_prefix=strip_prefix,
        unused_ok=lambda k: (
            k.startswith(("resnet.layer3.", "resnet.layer4.", "resnet.fc."))
            or k.startswith("extractor_final_conv.downsample.1.")
        ),
    )


def convert_sixdreg_state_dict(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    cfg,
    strip_prefix: str = "",
):
    """Fill a MapfreeRegression variables pytree from a torch state dict
    (mapfree_6dreg Lightning checkpoints).

    Expected-unused source keys: the frozen `matcher.*`/`matching.*`
    LoFTR/SuperGlue submodule (convert separately with
    convert_loftr_state_dict into the matcher's tree), `s_r`/`s_t`
    (Kendall-Cipolla loss weights — optimizer-side, not model params),
    and head.resblock4/head.mlp (only built when full_forward_pass=True,
    i.e. the non-FAR configurations)."""
    P, S = build_sixdreg_mapping(cfg)
    return _apply_mapping(
        state_dict, variables, P, S, strip_prefix=strip_prefix,
        unused_ok=lambda k: (
            k.startswith(("matcher.", "matching.", "head.resblock4.",
                          "head.mlp."))
            or k in ("s_r", "s_t")
        ),
    )

# --------------------------------------------------------------------- #
# SuperPoint / SuperGlue (magicleap/SuperGluePretrainedNetwork weights)
# --------------------------------------------------------------------- #

def _conv1d_linear(v):
    """torch Conv1d (O, I, 1) kernel -> flax Dense kernel (I, O)."""
    return np.transpose(_np(v)[:, :, 0], (1, 0))


def _fold_bn_conv1d(eps: float = 1e-5):
    """Fold an eval-mode BatchNorm1d into the preceding Conv1d.

    Our SuperGlue stand-in uses plain Dense layers where magicleap's MLP
    interleaves Conv1d + BatchNorm1d; at inference BN is the affine map
    y = (x - mean) * gamma / sqrt(var + eps) + beta, so it folds exactly
    into the conv's kernel/bias. (Conversion is therefore inference-
    exact; fine-tuning from converted weights has no BN statistics.)
    """

    def kernel_tf(conv_w, bn_w, bn_rv):
        scale = _np(bn_w) / np.sqrt(_np(bn_rv) + eps)       # (O,)
        return np.transpose(_np(conv_w)[:, :, 0] * scale[:, None], (1, 0))

    def bias_tf(conv_b, bn_w, bn_b, bn_rm, bn_rv):
        scale = _np(bn_w) / np.sqrt(_np(bn_rv) + eps)
        return (_np(conv_b) - _np(bn_rm)) * scale + _np(bn_b)

    return kernel_tf, bias_tf


def build_superpoint_mapping(cfg) -> Tuple[list, list]:
    """Mapping for SuperPointTPU from magicleap superpoint_v1.pth
    (SuperGluePretrainedNetwork/models/superpoint.py:110-133). All plain
    convs, no normalization layers."""
    names = ["conv1a", "conv1b", "conv2a", "conv2b",
             "conv3a", "conv3b", "conv4a", "conv4b"]
    P = []
    for i, src in enumerate(names):
        P.append((f"{src}.weight", (f"conv{i}", "kernel"), _conv))
        P.append((f"{src}.bias", (f"conv{i}", "bias"), _ident))
    for src, dst in (("convPa", "det_a"), ("convPb", "det_b"),
                     ("convDa", "desc_a"), ("convDb", "desc_b")):
        P.append((f"{src}.weight", (dst, "kernel"), _conv))
        P.append((f"{src}.bias", (dst, "bias"), _ident))
    return P, []


def build_superglue_mapping(cfg) -> Tuple[list, list]:
    """Mapping for SuperGlueTPU from magicleap superglue_{indoor,outdoor}
    checkpoints (SuperGluePretrainedNetwork/models/superglue.py).

    magicleap's MLPs are Conv1d stacks with BatchNorm1d between layers;
    BN is folded into the Dense weights (see _fold_bn_conv1d). The
    reference shares one final_proj for both images — it fills both of
    our final_proj / final_proj2."""
    kernel_tf, bias_tf = _fold_bn_conv1d()
    P = []

    # keypoint encoder: MLP([3, 32, 64, 128, 256, D]) -> kenc_0..kenc_4
    # module indices: conv at 3i, BN at 3i+1 for the first four layers,
    # bare conv at index 12 for the last
    for i in range(4):
        c, b = f"kenc.encoder.{3 * i}", f"kenc.encoder.{3 * i + 1}"
        P.append(((f"{c}.weight", f"{b}.weight", f"{b}.running_var"),
                  (f"kenc_{i}", "kernel"), kernel_tf))
        P.append(((f"{c}.bias", f"{b}.weight", f"{b}.bias",
                   f"{b}.running_mean", f"{b}.running_var"),
                  (f"kenc_{i}", "bias"), bias_tf))
    P.append(("kenc.encoder.12.weight", ("kenc_4", "kernel"),
              _conv1d_linear))
    P.append(("kenc.encoder.12.bias", ("kenc_4", "bias"), _ident))

    # GNN: gnn.layers.{2i} = self_i, gnn.layers.{2i+1} = cross_i
    n_layers = cfg.num_layers
    for i in range(2 * n_layers):
        src = f"gnn.layers.{i}"
        dst = f"self_{i // 2}" if i % 2 == 0 else f"cross_{i // 2}"
        for j, name in enumerate(("q", "k", "v")):
            P.append((f"{src}.attn.proj.{j}.weight",
                      (dst, "attn", name, "kernel"), _conv1d_linear))
            P.append((f"{src}.attn.proj.{j}.bias",
                      (dst, "attn", name, "bias"), _ident))
        P.append((f"{src}.attn.merge.weight",
                  (dst, "attn", "merge", "kernel"), _conv1d_linear))
        P.append((f"{src}.attn.merge.bias",
                  (dst, "attn", "merge", "bias"), _ident))
        # mlp = MLP([2D, 2D, D]): Conv1d at 0, BN at 1, Conv1d at 3
        c, b = f"{src}.mlp.0", f"{src}.mlp.1"
        P.append(((f"{c}.weight", f"{b}.weight", f"{b}.running_var"),
                  (dst, "fc1", "kernel"), kernel_tf))
        P.append(((f"{c}.bias", f"{b}.weight", f"{b}.bias",
                   f"{b}.running_mean", f"{b}.running_var"),
                  (dst, "fc1", "bias"), bias_tf))
        P.append((f"{src}.mlp.3.weight", (dst, "fc2", "kernel"),
                  _conv1d_linear))
        P.append((f"{src}.mlp.3.bias", (dst, "fc2", "bias"), _ident))

    for dst in ("final_proj", "final_proj2"):  # shared in the reference
        P.append(("final_proj.weight", (dst, "kernel"), _conv1d_linear))
        P.append(("final_proj.bias", (dst, "bias"), _ident))
    P.append(("bin_score", ("bin_score",), _ident))
    return P, []


def convert_superpoint_state_dict(state_dict, variables, cfg,
                                  strip_prefix: str = ""):
    """Fill a SuperPointTPU variables pytree from magicleap
    superpoint_v1.pth."""
    P, S = build_superpoint_mapping(cfg)
    return _apply_mapping(state_dict, variables, P, S,
                          strip_prefix=strip_prefix)


def convert_superglue_state_dict(state_dict, variables, cfg,
                                 strip_prefix: str = ""):
    """Fill a SuperGlueTPU variables pytree from magicleap
    superglue_{indoor,outdoor}.pth (BN folded; inference-exact)."""
    P, S = build_superglue_mapping(cfg)
    return _apply_mapping(state_dict, variables, P, S,
                          strip_prefix=strip_prefix)
