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
                 flax_path: Tuple[str, ...], layout: str = "ident",
                 call: int = 0, elem: Optional[int] = None):
        self.name = name
        self.torch_module = torch_module
        self.flax_path = flax_path
        self.layout = layout
        self.call = call      # which invocation of the module (0-based)
        self.elem = elem      # tuple element of the output, if any


VITESS_TAPS: List[Tap] = [
    Tap("resnet", "resnet.layer2", ("resnet",), layout="nchw"),
    Tap("extractor", "extractor_final_conv",
        ("extractor_final_conv",), layout="nchw"),
    Tap("features", "fusion_transformer.norm", ("norm",),
        layout="reshape"),   # torch (B*2, Dv, C) vs ours (B, 2*Dv, C)
]

SIXDREG_TAPS: List[Tap] = [
    Tap("vol0", "encoder", ("encoder",), layout="nchw", call=0),
    Tap("vol1", "encoder", ("encoder",), layout="nchw", call=1),
    Tap("gvol", "aggregator", ("aggregator",), layout="nchw"),
    Tap("feats", "head", ("head",), layout="nchw", elem=1),
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
    return out, state["intermediates"]


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
    return out, state["intermediates"]


_FAMILY = {
    "vitess": (VITESS_TAPS, _replay_vitess),
    "sixdreg": (SIXDREG_TAPS, _replay_sixdreg),
}


def run_parity(fixture_path: str, cfg, variables=None,
               atol: float = 1e-3) -> Dict[str, Any]:
    """Convert the fixture's state dict, replay its inputs through our
    model, and compare every recorded tap.

    Returns {"family", "taps": {name: max_abs_err}, "skipped": [...],
    "ok": bool}. ``variables`` (an initialized pytree) is required —
    init shapes depend on the fixture inputs, so callers own it.
    """
    from far_tpu.utils.convert_weights import (
        convert_sixdreg_state_dict,
        convert_vitess_state_dict,
    )

    meta, inputs, sd, taps = load_fixture(fixture_path)
    family = meta["family"]
    if family not in _FAMILY:
        raise ValueError(f"unknown fixture family {family}")
    tap_specs, replay = _FAMILY[family]

    convert = {"vitess": convert_vitess_state_dict,
               "sixdreg": convert_sixdreg_state_dict}[family]
    converted, report = convert(sd, variables, cfg)
    if report["missing"]:
        raise ValueError(
            f"fixture state dict missing mapped keys: "
            f"{report['missing'][:8]}")

    _, inters = replay(cfg, converted, inputs)

    errs: Dict[str, float] = {}
    skipped: List[str] = []
    for tap in tap_specs:
        if tap.name not in taps:
            skipped.append(tap.name)
            continue
        ours = _get_intermediate(inters, tap)
        if ours is None:
            skipped.append(tap.name)
            continue
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
        "ok": bool(errs) and all(e <= atol for e in errs.values()),
    }
