"""Recorded-activation parity harness for converted checkpoints.

Validates a torch->Flax weight conversion layer-by-layer against
activations recorded from the reference implementation — the mechanism
behind the BASELINE.md demo-pose parity anchors. The release
checkpoints are not available in every environment, so the harness is
fixture-driven: it runs the moment a fixture recorded elsewhere is
dropped in.

Workflow:
1. On a machine with the reference repo (crockwell/far) + a released
   checkpoint, record a fixture with :func:`record_torch_fixture`
   (generic forward hooks — works on any ``torch.nn.Module``).
2. Here, :func:`run_parity` converts the state dict embedded in the
   fixture, replays the recorded inputs through our model with
   ``capture_intermediates``, and compares every tap.

Fixture format — a single ``.npz``:
- ``meta``: JSON string ``{"family": ..., "taps": [...]}``
- ``input.<name>``: recorded model inputs (family-specific, see
  ``_FAMILY`` below for expected names/layouts)
- ``sd.<torch_key>``: the torch state dict
- ``tap.<name>``: recorded activation at that tap (torch layout)

Tap tables reference the torch module names of
- interiornetStreetlearn_8ptVit/src/model.py (ViTEss)
- mapfree_6dreg/lib/models/regression/model.py (6DReg)
- mp3d_loftr/src/loftr/loftr.py (FARLoFTR; output-level taps)
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------- #
# tap specs
# --------------------------------------------------------------------- #
# layout: how to map the recorded torch activation onto ours
#   nchw    -> transpose (B, C, H, W) to (B, H, W, C)
#   reshape -> plain reshape to our shape (token regroupings)
#   ident   -> compare as-is

class Tap:
    def __init__(self, name: str, torch_module: str,
                 flax_path: Optional[Tuple[str, ...]], layout: str = "ident",
                 call: int = 0, elem: Optional[int] = None,
                 atol: Optional[float] = None):
        self.name = name
        self.torch_module = torch_module
        self.flax_path = flax_path  # None -> read from the replay's
                                    # returned dict by tap name instead
                                    # of the captured intermediates
        self.layout = layout
        self.call = call      # which invocation of the module (0-based)
        self.elem = elem      # tuple element of the output, if any
        self.atol = atol      # per-tap tolerance override (ill-conditioned
                              # taps where torch's own f32 noise > global)


VITESS_TAPS: List[Tap] = [
    Tap("resnet", "resnet.layer2", ("resnet",), layout="nchw"),
    Tap("extractor", "extractor_final_conv",
        ("extractor_final_conv",), layout="nchw"),
    # torch (B*2, Dv, C) vs ours (B, 2*Dv, C). atol: the final LN rows
    # have near-zero variance, so this tap amplifies f32 rounding —
    # torch's own f32-vs-f64 drift here measures ~5e-4 (all downstream
    # outputs still land at 1e-6).
    Tap("features", "fusion_transformer.norm", ("norm",),
        layout="reshape", atol=2e-3),
    Tap("pred_t", "(output) tran_preds_unnorm", None),
    Tap("pred_rmtx", "(output) rot_preds_mtx", None),
    Tap("pred_r6", "(output) rot_preds_6d", None),
]

SIXDREG_TAPS: List[Tap] = [
    Tap("vol0", "encoder", ("encoder",), layout="nchw", call=0),
    Tap("vol1", "encoder", ("encoder",), layout="nchw", call=1),
    Tap("gvol", "aggregator", ("aggregator",), layout="nchw"),
    Tap("feats", "head", ("head",), layout="nchw", elem=1),
    Tap("feats_tr", "transformer (last layer)", ("transformer_5",),
        layout="ncl"),   # torch (B, C, L) vs ours (B, L, C)
    Tap("pred_r6", "(output) regression_mlp R", None),
    Tap("pred_t", "(output) regression_mlp t", None),
]

# FARLoFTR taps come from the replay's returned dict (the reference
# routes activations through a mutable data dict, not module outputs;
# the recorder mirrors that by saving data-dict entries directly).
FARLOFTR_TAPS: List[Tap] = [
    Tap("feats_c", "(data) feats_c", None, layout="nchw"),
    Tap("feat_f0", "(data) featmap_f0", None, layout="nchw"),
    Tap("feat_c0", "(data) featmap0 post-coarse", None),
    Tap("feat_c1", "(data) featmap1 post-coarse", None),
    Tap("conf_matrix", "(data) conf_matrix", None, layout="reshape"),
    Tap("expec_f", "(data) expec_f", None, layout="reshape"),
    # atol: pixel-unit coordinates — expec_f's f32 noise (~1e-4,
    # softmax-expectation over a 25-logit window) times the fine scale
    # lands around 4e-4 px; sub-milli-pixel is parity.
    Tap("mkpts1_f", "(data) mkpts1_f", None, layout="reshape", atol=2e-3),
    Tap("pred_rt", "(data) regressed_rt", None),
    Tap("gate", "(data) gating weights", None),
]


# --------------------------------------------------------------------- #
# torch-side recorder (requires torch; run where the reference lives)
# --------------------------------------------------------------------- #

def record_torch_fixture(module, taps: List[Tap],
                         inputs: Dict[str, np.ndarray],
                         forward: Callable[[Any, Dict[str, Any]], Any],
                         path: str, family: str) -> None:
    """Record a parity fixture from a live torch module.

    ``forward(module, torch_inputs)`` runs the reference forward pass;
    hooks capture each tap's output. The module's state dict and the
    numpy ``inputs`` are embedded so the fixture is self-contained.
    """
    import torch

    captured: Dict[str, List[np.ndarray]] = {}
    handles = []
    mods = dict(module.named_modules())
    for tap in taps:
        if tap.torch_module not in mods:
            continue

        def hook(m, args, out, _tap=tap):
            o = out[_tap.elem] if _tap.elem is not None else out
            captured.setdefault(_tap.name, []).append(
                o.detach().cpu().numpy())

        handles.append(mods[tap.torch_module].register_forward_hook(hook))
    try:
        with torch.no_grad():
            forward(module, {k: torch.from_numpy(np.asarray(v))
                             for k, v in inputs.items()})
    finally:
        for h in handles:
            h.remove()

    arrays: Dict[str, np.ndarray] = {}
    tap_names = []
    for tap in taps:
        if tap.name in captured and len(captured[tap.name]) > tap.call:
            arrays[f"tap.{tap.name}"] = captured[tap.name][tap.call]
            tap_names.append(tap.name)
    for k, v in inputs.items():
        arrays[f"input.{k}"] = np.asarray(v)
    for k, v in module.state_dict().items():
        arrays[f"sd.{k}"] = v.detach().cpu().numpy()
    arrays["meta"] = np.asarray(
        json.dumps({"family": family, "taps": tap_names}))
    np.savez_compressed(path, **arrays)


def save_fixture(fixture, path: str, half_taps: bool = False) -> None:
    """Persist an in-memory ``(meta, inputs, sd, taps)`` fixture (as
    produced by tests.refloader's recorders) to the standard .npz layout
    that :func:`load_fixture` reads — the committed "golden" fixtures
    under tests/golden/ are written this way.

    ``half_taps`` stores float32 taps as float16 (halves the committed
    golden fixtures; replay compares with a correspondingly widened
    tolerance — layout/converter regressions produce O(1) errors, far
    above f16 rounding)."""
    meta, inputs, sd, taps = fixture
    arrays: Dict[str, np.ndarray] = {
        "meta": np.asarray(json.dumps(meta))}
    for k, v in inputs.items():
        arrays[f"input.{k}"] = np.asarray(v)
    for k, v in sd.items():
        arrays[f"sd.{k}"] = np.asarray(v)
    for k, v in taps.items():
        v = np.asarray(v)
        if half_taps and v.dtype == np.float32:
            v = v.astype(np.float16)
        arrays[f"tap.{k}"] = v
    np.savez_compressed(path, **arrays)


def sd_spec_of(sd: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Shape/dtype spec of a state dict (for PRNG-synthesized fixtures)."""
    return {k: {"shape": list(np.asarray(v).shape),
                "dtype": str(np.asarray(v).dtype)}
            for k, v in sd.items()}


def synth_state_dict(spec: Dict[str, Dict], seed: int = 0
                     ) -> Dict[str, np.ndarray]:
    """Deterministically synthesize a torch-layout state dict from a
    shape spec — the SAME arrays on any machine, with or without torch.

    The committed golden fixtures (tests/golden/) store only this spec:
    the recorder overwrites the live reference model's weights with
    these arrays before recording taps, and the fast-tier replay
    regenerates them here, so multi-hundred-MB weight blobs never enter
    the repo. Per-key streams are independent (seeded by crc32 of the
    key), so adding/removing keys can't shift other keys' values.

    Scheme v1 (He-style so activations stay sane through the nets):
    - float ndim>=2: normal * sqrt(2 / fan_in), fan_in = prod(shape[1:])
    - float ndim<2 with 'running_var'/'_var' in key: |1 + 0.1 normal|
    - other float ndim<2: 0.05 * normal  (biases, LN/BN affine deltas
      are applied as recorded — BN/LN weights get 1 + that delta)
    - 'weight' 1-D of norm layers can't be told apart from biases by
      shape, so ALL 1-D floats except *_var use 0.05*normal + (1.0 if
      key endswith 'weight' else 0.0)
    - ints: zeros
    - keys with ``alias_of`` (torch modules whose state dict exposes the
      SAME storage under two names, e.g. a shared shortcut norm) copy
      the canonical key's array, mirroring the aliasing torch enforces
      on load_state_dict
    """
    import zlib

    out = {}
    for k in sorted(spec):
        if spec[k].get("alias_of"):
            continue
        shape = tuple(spec[k]["shape"])
        dtype = np.dtype(spec[k]["dtype"])
        rng = np.random.default_rng([seed, zlib.crc32(k.encode())])
        if not np.issubdtype(dtype, np.floating):
            out[k] = np.zeros(shape, dtype)
            continue
        if len(shape) >= 2:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.standard_normal(shape) * np.sqrt(2.0 / max(1, fan_in))
        elif "running_var" in k or k.endswith("_var"):
            arr = np.abs(1.0 + 0.1 * rng.standard_normal(shape))
        else:
            arr = 0.05 * rng.standard_normal(shape)
            if k.endswith("weight"):  # norm-layer scale around 1
                arr = arr + 1.0
        out[k] = arr.astype(dtype)
    for k in spec:
        src = spec[k].get("alias_of")
        if src:
            out[k] = out[src]
    return out


def load_fixture(path: str):
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    inputs = {k[len("input."):]: z[k] for k in z.files
              if k.startswith("input.")}
    sd = {k[len("sd."):]: z[k] for k in z.files if k.startswith("sd.")}
    taps = {k[len("tap."):]: z[k] for k in z.files if k.startswith("tap.")}
    return meta, inputs, sd, taps


# --------------------------------------------------------------------- #
# flax-side replay + comparison
# --------------------------------------------------------------------- #

def _get_intermediate(inters, tap: Tap):
    node = inters
    for k in tap.flax_path:
        if k not in node:
            return None
        node = node[k]
    calls = node.get("__call__")
    if calls is None or len(calls) <= tap.call:
        return None
    out = calls[tap.call]
    if tap.elem is not None:
        out = out[tap.elem]
    return np.asarray(out, np.float32)


def _align(expected: np.ndarray, ours: np.ndarray, layout: str):
    if layout == "nchw":
        expected = np.transpose(expected, (0, 2, 3, 1))
    elif layout == "ncl":
        expected = np.transpose(expected, (0, 2, 1))
    if expected.shape != ours.shape:
        if expected.size == ours.size:  # token regroupings
            expected = expected.reshape(ours.shape)
        else:
            return None
    return expected


def _replay_vitess(cfg, variables, inputs):
    import jax.numpy as jnp

    from far_tpu.models.vitess import ViTEss

    model = ViTEss(cfg)
    # reference input: (B, 2, 3, H, W) BGR in [0, 255]; ours: RGB [0, 1]
    images = np.asarray(inputs["images"], np.float32)
    if images.shape[2] == 3 and images.ndim == 5:
        images = images[:, :, ::-1].transpose(0, 1, 3, 4, 2) / 255.0
    sp = inputs.get("solver_pose")
    nc = inputs.get("solver_num_corr")
    out, state = model.apply(
        variables, jnp.asarray(images),
        None if sp is None else jnp.asarray(sp),
        None if nc is None else jnp.asarray(nc),
        train=False, capture_intermediates=True, mutable=["intermediates"])
    tran, R, pred_9d, _gate = out
    outs = {"pred_t": tran, "pred_rmtx": R, "pred_r6": pred_9d[..., 3:]}
    return outs, state["intermediates"]


def _replay_sixdreg(cfg, variables, inputs):
    import jax.numpy as jnp

    from far_tpu.models.sixdreg import MapfreeRegression

    model = MapfreeRegression(cfg)

    def img(key):
        x = np.asarray(inputs[key], np.float32)
        if x.ndim == 4 and x.shape[1] == 3:       # NCHW -> NHWC
            x = x.transpose(0, 2, 3, 1)
        return jnp.asarray(x)

    sp = inputs.get("solver_rt")
    inl = inputs.get("solver_inliers")
    out, state = model.apply(
        variables, img("image0_reg"), img("image1_reg"),
        None if sp is None else jnp.asarray(sp),
        None if inl is None else jnp.asarray(inl),
        train=False, capture_intermediates=True, mutable=["intermediates"])
    _R, t, pred_9d, _gate = out
    outs = {"pred_r6": pred_9d[..., 3:], "pred_t": t}
    return outs, state["intermediates"]


def _replay_farloftr(cfg, variables, inputs):
    """Replay a farloftr fixture stage by stage.

    The reference LoFTR routes everything through a mutable data dict
    (loftr.py:57-192), with dynamic match selection between the coarse
    and fine stages. The fixture therefore records the torch coarse
    match ids, and the replay injects those exact ids into our fine
    stage — comparing each stage's numerics rather than the (ours:
    static top-k, theirs: dynamic threshold) selection policy.
    """
    import jax.numpy as jnp

    from far_tpu.models import matching as matching_mod
    from far_tpu.models.fine import fine_coords_to_kpts
    from far_tpu.models.loftr import FARLoFTR
    from far_tpu.models.position import add_sine_position_encoding
    from far_tpu.types import PairBatch, SolverSummary

    model = FARLoFTR(cfg)
    hc, wc = cfg.coarse_hw
    stride = cfg.backbone.resolution[0]
    fine_stride_ratio = stride // cfg.backbone.resolution[1]

    def img(key):  # torch (B, 1, H, W) -> (B, H, W, 1)
        return jnp.asarray(
            np.transpose(np.asarray(inputs[key], np.float32), (0, 2, 3, 1)))

    image0, image1 = img("image0"), img("image1")
    B = image0.shape[0]
    K = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
    batch = PairBatch(image0=image0, image1=image1, K0=K, K1=K)
    i_ids = jnp.asarray(inputs["i_ids"], jnp.int32).reshape(B, -1)
    j_ids = jnp.asarray(inputs["j_ids"], jnp.int32).reshape(B, -1)
    scalar = lambda key: jnp.asarray(
        np.asarray(inputs[key], np.float32).reshape(B))
    summary = SolverSummary(
        rt=jnp.asarray(np.asarray(inputs["solver_rt"], np.float32)
                       .reshape(B, 3, 4)),
        num_before=scalar("num_before"), num_after=scalar("num_after"),
        num_tight=scalar("num_tight"),
        num_ultra_tight=scalar("num_ultra"),
        success=jnp.ones((B,), bool),
    )

    def full(m, batch, i_ids, j_ids, summary):
        imgs = jnp.concatenate([batch.image0, batch.image1], axis=0)
        feat_c, feat_f = m.backbone(imgs, train=False)
        feat_c0, feat_c1 = feat_c[:B], feat_c[B:]
        feat_f0, feat_f1 = feat_f[:B], feat_f[B:]
        pe0 = add_sine_position_encoding(feat_c0, cfg.coarse.temp_bug_fix)
        pe1 = add_sine_position_encoding(feat_c1, cfg.coarse.temp_bug_fix)
        t0 = pe0.reshape(B, hc * wc, -1)
        t1 = pe1.reshape(B, hc * wc, -1)
        t0, t1 = m.loftr_coarse(t0, t1)
        conf = matching_mod.dual_softmax_confidence(
            t0, t1, cfg.match.dsmax_temperature)
        f0w, f1w = m.fine_preprocess(
            feat_f0, feat_f1, t0, t1, i_ids, j_ids, (hc, wc),
            stride=fine_stride_ratio)
        expec_f = m.fine_matching(f0w, f1w)
        mkpts1_c = matching_mod.ids_to_coords(j_ids, wc, float(stride))
        mkpts1_f = fine_coords_to_kpts(
            expec_f, mkpts1_c, cfg.fine.window_size,
            float(cfg.backbone.resolution[1]))
        pred_rt, gate, _ = m.regress(t0, t1, summary)
        return {
            "feats_c": feat_c, "feat_f0": feat_f0,
            "feat_c0": t0, "feat_c1": t1, "conf_matrix": conf,
            "expec_f": expec_f, "mkpts1_f": mkpts1_f,
            "pred_rt": pred_rt, "gate": gate,
        }

    outs = model.apply(variables, batch, i_ids, j_ids, summary,
                       method=full)
    return {k: np.asarray(v, np.float32) for k, v in outs.items()}, {}


_FAMILY = {
    "vitess": (VITESS_TAPS, _replay_vitess),
    "sixdreg": (SIXDREG_TAPS, _replay_sixdreg),
    "farloftr": (FARLOFTR_TAPS, _replay_farloftr),
}


def run_parity(fixture, cfg, variables=None,
               atol: float = 1e-3, rtol_max: float = 0.0) -> Dict[str, Any]:
    """Convert the fixture's state dict, replay its inputs through our
    model, and compare every recorded tap.

    ``fixture`` is either a path to a recorded .npz or an in-memory
    ``(meta, inputs, sd, taps)`` tuple (as produced by
    ``load_fixture`` / the torch-side recorders).

    Raises on a state dict with missing mapped keys OR unexpectedly
    unused source keys — a converter that silently leaves real torch
    weights behind is exactly the bug class this harness exists to
    catch.

    Returns {"family", "taps": {name: max_abs_err}, "skipped": [...],
    "ok": bool}. ``variables`` (an initialized pytree) is required —
    init shapes depend on the fixture inputs, so callers own it.
    """
    from far_tpu.utils.convert_weights import (
        convert_loftr_state_dict,
        convert_sixdreg_state_dict,
        convert_vitess_state_dict,
    )

    if isinstance(fixture, (tuple, list)):
        meta, inputs, sd, taps = fixture
    else:
        meta, inputs, sd, taps = load_fixture(fixture)
    family = meta["family"]
    if family not in _FAMILY:
        raise ValueError(f"unknown fixture family {family}")
    tap_specs, replay = _FAMILY[family]

    convert = {"vitess": convert_vitess_state_dict,
               "sixdreg": convert_sixdreg_state_dict,
               "farloftr": convert_loftr_state_dict}[family]
    converted, report = convert(sd, variables, cfg)
    if report["missing"]:
        raise ValueError(
            f"fixture state dict missing mapped keys: "
            f"{report['missing'][:8]}")
    if report["unused"]:
        raise ValueError(
            f"converter left source keys unmapped (silent weight drop): "
            f"{report['unused'][:8]}")

    outs, inters = replay(cfg, converted, inputs)

    errs: Dict[str, float] = {}
    tols: Dict[str, float] = {}
    skipped: List[str] = []
    for tap in tap_specs:
        if tap.name not in taps:
            skipped.append(tap.name)
            continue
        if tap.flax_path is None:
            ours = None
            if isinstance(outs, dict) and tap.name in outs:
                ours = np.asarray(outs[tap.name], np.float32)
        else:
            ours = _get_intermediate(inters, tap)
        if ours is None:
            skipped.append(tap.name)
            continue
        # rtol_max scales the gate with the tap's own magnitude — used
        # by the golden fixtures whose taps are f16-stored (rounding is
        # proportional to max|tap|, ~2^-11)
        tols[tap.name] = max(
            atol, tap.atol or 0.0,
            rtol_max * float(np.max(np.abs(taps[tap.name]))))
        expected = _align(np.asarray(taps[tap.name], np.float32),
                          ours, tap.layout)
        if expected is None:
            errs[tap.name] = float("inf")
            continue
        errs[tap.name] = float(np.max(np.abs(expected - ours)))
    return {
        "family": family,
        "taps": errs,
        "skipped": skipped,
        "ok": bool(errs) and all(e <= tols[k] for k, e in errs.items()),
    }
