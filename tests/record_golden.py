"""Record the committed golden parity fixtures (tests/golden/*.npz).

Runs the REAL torch reference models from /root/reference at their
production configurations, but with every weight OVERWRITTEN by
far_tpu.utils.parity.synth_state_dict — a deterministic numpy PRNG
stream reproducible without torch. The committed fixture then stores
only the weight SPEC (shapes), the inputs, and the recorded taps
(float16), so per-tap parity becomes a fast-tier regression gate
(tests/test_golden_parity.py) without committing hundreds of MB of
random weights. The live-torch slow tier (tests/test_real_parity.py)
remains the source-of-truth refresher.

Dropped from the golden LoFTR fixture (kept in the slow tier): the
(4800, 4800) conf_matrix tap — 92 MB that is transitively pinned by the
feat_c0/c1 taps upstream and expec_f/mkpts1_f/pred_rt downstream.

When a RELEASED checkpoint appears, the same machinery records a
demo-pose anchor: load the ckpt into the reference model, call the
refloader recorder, save_fixture WITHOUT synth (real weights embedded),
and run_parity replays it (see BASELINE.md parity anchors,
reference mp3d_loftr/scripts/demo.sh).

Usage: python -m tests.record_golden [outdir]
"""

import sys
from pathlib import Path

import numpy as np

SD_SEED = 17


def _resynth_weights(model, prefix=""):
    """Overwrite a torch module's state dict with the deterministic
    numpy-synthesized arrays (see parity.synth_state_dict).

    ``prefix`` must match the key prefix the family's refloader recorder
    adds when it emits the state dict ('matcher.' for LoFTR, 'module.'
    for ViTEss) — the synthesis stream is keyed by the PREFIXED name, so
    the fast-tier test regenerates identical arrays straight from the
    stored spec."""
    import torch

    from far_tpu.utils.parity import sd_spec_of, synth_state_dict

    tensors = dict(model.state_dict().items())
    sd = {f"{prefix}{k}": v.detach().cpu().numpy()
          for k, v in tensors.items()}
    spec = sd_spec_of(sd)
    # torch state dicts can expose the SAME storage under several keys
    # (e.g. a residual block whose shortcut norm aliases norm2); loading
    # distinct arrays would leave only the last write, so alias them in
    # the spec and the synthesis stream copies the canonical key
    by_ptr = {}
    for k in sorted(tensors):
        ptr = (tensors[k].data_ptr(), tuple(tensors[k].shape))
        canon = by_ptr.setdefault(ptr, k)
        if canon != k:
            spec[f"{prefix}{k}"]["alias_of"] = f"{prefix}{canon}"
    synth = synth_state_dict(spec, seed=SD_SEED)
    model.load_state_dict(
        {k[len(prefix):]: torch.from_numpy(np.asarray(v))
         for k, v in synth.items()})
    return spec


def _golden(fixture, spec, drop_taps=()):
    meta, inputs, sd, taps = fixture
    taps = {k: v for k, v in taps.items() if k not in drop_taps}
    meta = dict(meta)
    meta["taps"] = sorted(taps)
    meta["sd_spec"] = spec
    meta["sd_seed"] = SD_SEED
    # keep the torch-prefix mapping discoverable: sd omitted, synthesized
    return meta, inputs, {}, taps


def main(outdir=None):
    outdir = Path(outdir or Path(__file__).parent / "golden")
    outdir.mkdir(parents=True, exist_ok=True)

    from far_tpu.utils.parity import save_fixture
    from tests.refloader import (
        load_reference_loftr,
        load_reference_sixdreg,
        load_reference_vitess,
        record_loftr_fixture,
        record_sixdreg_fixture,
        record_vitess_fixture,
    )

    model, _ = load_reference_loftr(seed=0)
    spec = _resynth_weights(model, prefix="matcher.")
    fx = record_loftr_fixture(model, image_hw=(480, 640), seed=0)
    save_fixture(_golden(fx, spec, drop_taps=("conf_matrix",)),
                 outdir / "farloftr_seed0.npz", half_taps=True)
    print(f"wrote {outdir / 'farloftr_seed0.npz'}")

    model, _ = load_reference_vitess(seed=0)
    spec = _resynth_weights(model, prefix="module.")
    fx = record_vitess_fixture(model, seed=0)
    save_fixture(_golden(fx, spec), outdir / "vitess_seed0.npz",
                 half_taps=True)
    print(f"wrote {outdir / 'vitess_seed0.npz'}")

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        model, _ = load_reference_sixdreg(seed=0, tmp_cwd=str(d))
        spec = _resynth_weights(model)
        fx = record_sixdreg_fixture(model, seed=0)
    save_fixture(_golden(fx, spec), outdir / "sixdreg_seed0.npz",
                 half_taps=True)
    print(f"wrote {outdir / 'sixdreg_seed0.npz'}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
