"""Import-and-instantiate helpers for the real torch reference models.

The parity tests need the actual reference implementations
(/root/reference/{mp3d_loftr,interiornetStreetlearn_8ptVit,
mapfree_6dreg}) running on CPU torch. Each repo is imported inside a
context that (a) puts tests/refshims + the repo root on sys.path,
(b) patches torch.Tensor.cuda to a no-op (the reference hardcodes
.cuda() inside forward passes), and (c) removes the repo's modules
afterwards (all three define colliding top-level `src`/`lib`/`configs`
packages).

Loaders return (model.eval(), config) with seeded random init — parity
is checked at random init, which exercises exactly the same conversion
and forward paths a released checkpoint would.
"""

from __future__ import annotations

import contextlib
import os
import sys

import numpy as np

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshims")
REFROOT = "/root/reference"


@contextlib.contextmanager
def reference_repo(repo: str):
    import torch

    root = os.path.join(REFROOT, repo)
    if not os.path.isdir(root):
        import pytest

        pytest.skip(f"reference repo {root} not available")
    before = set(sys.modules)
    sys.path.insert(0, root)
    sys.path.insert(0, SHIMS)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield root
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(root)
        sys.path.remove(SHIMS)
        for name in list(sys.modules):
            if name in before:
                continue
            mod = sys.modules.get(name)
            f = getattr(mod, "__file__", None) or ""
            if f.startswith(root) or f.startswith(SHIMS) or not f:
                del sys.modules[name]


@contextlib.contextmanager
def _cpu_cuda_patch():
    """torch.Tensor.cuda -> no-op (the reference hardcodes .cuda() in
    forward passes; the recorders run outside reference_repo)."""
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


def _lower(cfg):
    from yacs.config import CfgNode as CN

    if not isinstance(cfg, CN):
        return cfg
    return {k.lower(): _lower(v) for k, v in cfg.items()}


def load_reference_prior_ransac():
    """Import the reference prior-RANSAC engine (pure-torch paths).

    Reference: mp3d_loftr/third_party/prior_ransac/ransac.py:74-442.
    Returns the RANSAC class. The 'fundamental' and 'essential' model
    types run on CPU torch through the kornia shims; 'essential_cv2'
    (the production minimal-solver backend) needs OpenCV and raises.
    """
    with reference_repo("mp3d_loftr") as root:
        pr_dir = os.path.join(root, "third_party", "prior_ransac")
        sys.path.insert(0, pr_dir)
        try:
            import ransac as ref_ransac

            return ref_ransac.RANSAC
        finally:
            sys.path.remove(pr_dir)


def load_reference_loftr(seed: int = 0, coarse_layers: int = 3,
                         regress_loftr_layers: int = 1,
                         use_pos_embedding: bool = True):
    """The production FAR LoFTR (eval_matterport.sh flag set).

    Reference: mp3d_loftr/src/loftr/loftr.py:14-211 built with
    mp3d_loftr/test.py:150-230 config assembly.
    Returns (torch model in eval mode, lowered LOFTR config dict).
    """
    import torch

    with reference_repo("mp3d_loftr"):
        torch.manual_seed(seed)
        np.random.seed(seed)
        from src.config.default import get_cfg_defaults

        config = get_cfg_defaults()
        # loftr_ds_dense.py overrides
        config.LOFTR.MATCH_COARSE.MATCH_TYPE = "dual_softmax"
        config.LOFTR.MATCH_COARSE.SPARSE_SPVS = False
        # thr=0 keeps every mutual-NN match: at seeded-random init the
        # production thr=0.2 can select zero matches, which would leave
        # the fine stage untested
        config.LOFTR.MATCH_COARSE.THR = 0.0
        # eval_matterport.sh flags (test.py:159-216)
        config.LOFTR.PREDICT_TRANSLATION_SCALE = False
        config.LOFTR.REGRESS_RT = True
        config.LOFTR.REGRESS_LOFTR_LAYERS = regress_loftr_layers
        config.LOFTR.FROM_SAVED_PREDS = None
        config.LOFTR.SAVE_PREDS = None
        config.LOFTR.SOLVER = "prior_ransac"
        config.LOFTR.USE_MANY_RANSAC_THR = True
        config.LOFTR.REGRESS.USE_POS_EMBEDDING = use_pos_embedding
        config.LOFTR.REGRESS.REGRESS_USE_NUM_CORRES = True
        config.LOFTR.FINE_PRED_STEPS = 2
        config.LOFTR.REGRESS.SAVE_MLP_FEATS = False
        config.LOFTR.REGRESS.USE_SIMPLE_MOE = True
        config.LOFTR.REGRESS.USE_2WT = True
        config.LOFTR.REGRESS.USE_5050_WEIGHT = False
        config.LOFTR.REGRESS.USE_1WT = False
        config.LOFTR.REGRESS.SCALE_8PT = True
        # production uses False; True only records the gate for parity
        config.LOFTR.REGRESS.SAVE_GATING_WEIGHTS = True
        config.LOFTR.TRAINING = False
        if coarse_layers < 4:
            config.LOFTR.COARSE.LAYER_NAMES = \
                ["self", "cross"] * coarse_layers

        from src.loftr.loftr import LoFTR

        lowered = _lower(config.LOFTR)
        model = LoFTR(config=lowered).eval()
        return model, lowered


def record_loftr_fixture(model, image_hw=(480, 640), seed: int = 0):
    """Drive the real reference LoFTR forward + forward_rt_prediction
    and capture the data-dict activations as an in-memory fixture
    (meta, inputs, sd, taps) for far_tpu.utils.parity.run_parity.

    Reference call sequence: loftr.py:193-205 (forward), then the
    solver-side keys + loftr.py:176-192 (forward_rt_prediction).
    """
    import torch

    H, W = image_hw
    g = torch.Generator().manual_seed(seed + 100)
    img0 = torch.rand(1, 1, H, W, generator=g)
    img1 = torch.rand(1, 1, H, W, generator=g)
    data = {"image0": img0, "image1": img1}

    # a plausible near-identity solver pose (orthonormal R)
    aa = 0.08
    ca, sa = float(np.cos(aa)), float(np.sin(aa))
    rt = torch.tensor([[ca, -sa, 0.0, 0.10],
                       [sa, ca, 0.0, -0.05],
                       [0.0, 0.0, 1.0, 0.30]])

    with torch.no_grad(), _cpu_cuda_patch():
        model(data, train=False)
        data["loftr_rt"] = rt
        data["num_correspondences"] = torch.tensor([123.0])
        data["num_correspondences_before_ransac"] = torch.tensor([456.0])
        data["inliers_best_tight"] = torch.tensor([78.0])
        data["inliers_best_ultra_tight"] = torch.tensor([12.0])
        model.forward_rt_prediction(data)

    t = lambda key: data[key].detach().cpu().numpy()
    taps = {
        "feats_c": t("feats_c"),
        "feat_f0": t("featmap_f0"),
        "feat_c0": t("featmap0"),       # post-coarse tokens (1, L, C)
        "feat_c1": t("featmap1"),
        "conf_matrix": t("conf_matrix"),
        "expec_f": t("expec_f"),
        "mkpts1_f": t("mkpts1_f"),
        "pred_rt": t("regressed_rt"),
    }
    if "gating_reg_weights" in data:
        taps["gate"] = t("gating_reg_weights")
    inputs = {
        "image0": img0.numpy(), "image1": img1.numpy(),
        "i_ids": t("i_ids").astype(np.int64),
        "j_ids": t("j_ids").astype(np.int64),
        "solver_rt": rt.numpy(),
        "num_after": np.asarray([123.0], np.float32),
        "num_before": np.asarray([456.0], np.float32),
        "num_tight": np.asarray([78.0], np.float32),
        "num_ultra": np.asarray([12.0], np.float32),
    }
    sd = {f"matcher.{k}": v.detach().cpu().numpy()
          for k, v in model.state_dict().items()}
    meta = {"family": "farloftr", "taps": sorted(taps)}
    return meta, inputs, sd, taps


def load_reference_vitess(seed: int = 0, dataset: str = "interiornet_T"):
    """The production 8pt-ViT (train_interiornet_t.sh flag set).

    Reference: interiornetStreetlearn_8ptVit/src/model.py:38-217.
    Returns (torch model in eval mode, args namespace).
    """
    import argparse

    import torch

    with reference_repo("interiornetStreetlearn_8ptVit"):
        torch.manual_seed(seed)
        np.random.seed(seed)
        args = argparse.Namespace(
            fusion_transformer=True,
            fc_hidden_size=512,
            pool_size=60,
            transformer_depth=6,
            use_loftr_gating=True,
            use_normalized_6d=True,
            T_pose=torch.eye(3),
        )
        from far_tpu.models.vitess import VITESS_POSE_STATS

        mean, std = VITESS_POSE_STATS[dataset]
        from src.model import ViTEss

        model = ViTEss(
            args,
            global_pose_mean=torch.tensor(mean, dtype=torch.float32),
            global_pose_std=torch.tensor(std, dtype=torch.float32),
        ).eval()
        return model, args


def record_vitess_fixture(model, seed: int = 0):
    """Drive the real reference ViTEss (model.py:165-217) and record a
    parity fixture. Inputs are 224x224 so the nearest-resize is a no-op
    on both sides (the resize convention itself is torch nearest, which
    our model reproduces exactly)."""
    import torch

    g = torch.Generator().manual_seed(seed + 200)
    images = torch.rand(1, 2, 3, 224, 224, generator=g) * 255.0  # BGR
    aa = 0.1
    ca, sa = float(np.cos(aa)), float(np.sin(aa))
    rt = torch.tensor([[[ca, 0.0, sa, 0.05],
                        [0.0, 1.0, 0.0, 0.20],
                        [-sa, 0.0, ca, -0.10]]])
    num_corr = torch.tensor([321.0])

    captured = {}
    mods = dict(model.named_modules())
    handles = []
    for name, mod_name in (("resnet", "resnet.layer2"),
                           ("extractor", "extractor_final_conv"),
                           ("features", "fusion_transformer.norm")):
        def hook(m, args, out, _n=name):
            captured[_n] = out.detach().cpu().numpy()

        handles.append(mods[mod_name].register_forward_hook(hook))
    # production intrinsics (interiornet.py:100: [128]*4 for 256x256 —
    # center principal point, fx == cx); the basis depends only on the
    # fx/cx, fy/cy ratios, so [112]*4 at 224 input is the same camera
    intr = torch.full((1, 2, 4), 112.0)
    try:
        with torch.no_grad(), _cpu_cuda_patch():
            tran, _rot, rmtx, r6 = model(
                images.clone(), intrinsics=intr,
                loftr_preds=rt, loftr_num_corr=num_corr)
    finally:
        for h in handles:
            h.remove()

    taps = dict(captured)
    taps["pred_t"] = tran.detach().cpu().numpy()
    taps["pred_rmtx"] = rmtx.detach().cpu().numpy()
    taps["pred_r6"] = r6.detach().cpu().numpy()
    inputs = {
        "images": images.numpy(),
        "solver_pose": rt.numpy(),
        "solver_num_corr": num_corr.numpy(),
    }
    sd = {f"module.{k}": v.detach().cpu().numpy()
          for k, v in model.state_dict().items()}
    meta = {"family": "vitess", "taps": sorted(taps)}
    return meta, inputs, sd, taps


def record_sixdreg_fixture(model, seed: int = 0):
    """Drive the real reference map-free regression pieces
    (model.py:280-300 inner forward, bypassing the frozen matcher and
    the cv2 solver loop) and record a parity fixture."""
    import torch

    g = torch.Generator().manual_seed(seed + 300)
    img0 = torch.rand(1, 3, 360, 270, generator=g)
    img1 = torch.rand(1, 3, 360, 270, generator=g)
    aa = 0.12
    ca, sa = float(np.cos(aa)), float(np.sin(aa))
    rt = torch.tensor([[[ca, -sa, 0.0, 0.4],
                        [sa, ca, 0.0, 0.1],
                        [0.0, 0.0, 1.0, -0.8]]])
    inliers = torch.tensor([[200.0, 80.0, 15.0]])

    with torch.no_grad(), _cpu_cuda_patch():
        vol0 = model.encoder(img0)
        vol1 = model.encoder(img1)
        gvol = model.aggregator(vol0, vol1)
        _R, _t, feats = model.head(gvol, {})
        B, C, Hf, Wf = feats.shape
        feats_in = feats.reshape([B, C, Hf * Wf])
        feats_tr = model.transformer(
            feats_in.permute([2, 0, 1])).permute([1, 2, 0])
        r6, t = model.regression_mlp(feats_tr, rt, inliers)

    t_np = lambda x: x.detach().cpu().numpy()
    taps = {
        "vol0": t_np(vol0), "vol1": t_np(vol1), "gvol": t_np(gvol),
        "feats": t_np(feats), "feats_tr": t_np(feats_tr),
        "pred_r6": t_np(r6), "pred_t": t_np(t),
    }
    inputs = {
        "image0_reg": img0.numpy(), "image1_reg": img1.numpy(),
        "solver_rt": rt.numpy(),
        "solver_inliers": inliers.numpy(),
    }
    sd = {k: v.detach().cpu().numpy()
          for k, v in model.state_dict().items()
          if not k.startswith("matcher.")}
    meta = {"family": "sixdreg", "taps": sorted(taps)}
    return meta, inputs, sd, taps


def load_reference_sixdreg(seed: int = 0, tmp_cwd: str = None):
    """The production map-free regression model
    (rot6d_trans_with_loftr.yaml + use_loftr_preds + vanilla transformer).

    Reference: mapfree_6dreg/lib/models/regression/model.py:33-308.
    The ctor loads the frozen LoFTR matcher weights from a relative
    path; we chdir into ``tmp_cwd`` where an empty state-dict file is
    planted (strict=False load — the matcher stays random, which is
    irrelevant: it is bypassed in the parity forward).
    Returns (torch model in eval mode, yacs cfg).
    """
    import torch

    with reference_repo("mapfree_6dreg") as root:
        torch.manual_seed(seed)
        np.random.seed(seed)
        from yacs.config import CfgNode  # the shim

        sys.path.insert(0, root)  # for `etc.` imports
        from config.default import cfg as default_cfg

        cfg = default_cfg.clone()
        cfg.merge_from_file(os.path.join(
            root, "config/regression/mapfree/rot6d_trans_with_loftr.yaml"))
        assert isinstance(cfg, CfgNode)

        # The vendored LoFTR/SuperGlue matchers are empty git submodules
        # in the reference checkout; model.py imports them at module
        # scope but the parity forward bypasses the matcher entirely.
        # Register parameter-free stubs under the expected names.
        import types

        import torch.nn as nn

        class _StubMatcher(nn.Module):
            def __init__(self, config=None):
                super().__init__()

        loftr_mod = types.ModuleType(
            "etc.feature_matching_baselines.LoFTR.src.loftr")
        loftr_mod.LoFTR = _StubMatcher
        loftr_mod.default_cfg = {}
        sg_mod = types.ModuleType(
            "etc.feature_matching_baselines.SuperGlue.models.matching")
        sg_mod.Matching = _StubMatcher
        stubs = {
            "etc.feature_matching_baselines.LoFTR.src": types.ModuleType(
                "etc.feature_matching_baselines.LoFTR.src"),
            "etc.feature_matching_baselines.LoFTR.src.loftr": loftr_mod,
            "etc.feature_matching_baselines.SuperGlue.models":
                types.ModuleType(
                    "etc.feature_matching_baselines.SuperGlue.models"),
            "etc.feature_matching_baselines.SuperGlue.models.matching":
                sg_mod,
        }
        sys.modules.update(stubs)

        old_cwd = os.getcwd()
        if tmp_cwd is not None:
            weights_dir = os.path.join(
                tmp_cwd, "etc/feature_matching_baselines/LoFTR/weights")
            os.makedirs(weights_dir, exist_ok=True)
            torch.save({"state_dict": {}},
                       os.path.join(weights_dir, "outdoor_ot.ckpt"))
            os.chdir(tmp_cwd)
        try:
            from lib.models.regression.model import RegressionModel

            model = RegressionModel(
                cfg, use_loftr_preds=True, use_vanilla_transformer=True,
                inference=True, use_prior=True,
            ).eval()
        finally:
            os.chdir(old_cwd)
            sys.path.remove(root)
        return model, cfg
