"""Fast-tier per-tap parity against the committed golden fixtures.

tests/golden/*.npz are recorded ONCE from the real torch reference
models (tests/record_golden.py): production configs, weights overwritten
with the deterministic numpy stream `parity.synth_state_dict`, taps
stored float16. This makes per-tap converter+replay parity a regression
gate that needs no live torch — the live-torch slow tier
(tests/test_real_parity.py) stays the 1e-4 source of truth.

Tolerance: taps are f16-stored, so each tap gates at
max(1e-3, 1e-3 * max|tap|) — f16 rounding is ~4.9e-4 relative, while
converter / layout / transform regressions produce O(1) errors.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"
ATOL = 1e-3      # absolute floor
RTOL_MAX = 1e-3  # f16 tap rounding is ~4.9e-4 * max|tap|


def _load_golden(name):
    from far_tpu.utils.parity import load_fixture, synth_state_dict

    path = GOLDEN / name
    if not path.exists():
        pytest.skip(f"golden fixture {name} not recorded "
                    f"(python -m tests.record_golden)")
    meta, inputs, sd, taps = load_fixture(path)
    assert not sd, "golden fixtures synthesize sd from meta.sd_spec"
    sd = synth_state_dict(meta["sd_spec"], seed=meta["sd_seed"])
    taps = {k: np.asarray(v, np.float32) for k, v in taps.items()}
    return meta, inputs, sd, taps


def _zeros_init(init_fn):
    import jax

    shapes = jax.eval_shape(init_fn)
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def test_farloftr_golden():
    import jax

    from far_tpu.models.loftr import FARLoFTR
    from far_tpu.types import PairBatch
    from far_tpu.utils.config import (
        AttentionStackConfig,
        FARConfig,
        RegressConfig,
    )
    from far_tpu.utils.parity import run_parity

    fixture = _load_golden("farloftr_seed0.npz")
    # the production FAR eval config (matches tests/test_real_parity.py)
    cfg = FARConfig(
        image_size=(480, 640),
        coarse=AttentionStackConfig(layer_names=("self", "cross") * 3),
        regress=RegressConfig(num_loftr_layers=1, use_pos_embedding=True),
        dtype="float32",
    )
    H, W = cfg.image_size
    batch = PairBatch(
        image0=np.zeros((1, H, W, 1), np.float32),
        image1=np.zeros((1, H, W, 1), np.float32),
        K0=np.eye(3, dtype=np.float32)[None],
        K1=np.eye(3, dtype=np.float32)[None],
    )
    variables = _zeros_init(
        lambda: FARLoFTR(cfg).init(jax.random.PRNGKey(0), batch))
    result = run_parity(fixture, cfg, variables, atol=ATOL, rtol_max=RTOL_MAX)
    # conf_matrix is deliberately absent from the golden fixture
    assert set(result["skipped"]) <= {"conf_matrix"}, result
    assert {"feat_c0", "expec_f", "pred_rt"} <= set(result["taps"]), result
    assert result["ok"], result


def test_vitess_golden():
    import jax
    import jax.numpy as jnp

    from far_tpu.models.vitess import ViTEss, ViTEssConfig
    from far_tpu.utils.parity import run_parity

    fixture = _load_golden("vitess_seed0.npz")
    cfg = ViTEssConfig(dataset="interiornet_T", use_loftr_gating=True,
                       dtype="float32")
    images = jnp.zeros((1, 2, 224, 224, 3), jnp.float32)
    sp = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
    nc = jnp.zeros((1,), jnp.float32)
    variables = _zeros_init(
        lambda: ViTEss(cfg).init(jax.random.PRNGKey(0), images, sp, nc,
                                 train=False))
    result = run_parity(fixture, cfg, variables, atol=ATOL, rtol_max=RTOL_MAX)
    assert not result["skipped"], result
    assert result["ok"], result


def test_sixdreg_golden():
    import jax
    import jax.numpy as jnp

    from far_tpu.models.sixdreg import MapfreeRegression, SixDRegConfig
    from far_tpu.utils.parity import run_parity

    fixture = _load_golden("sixdreg_seed0.npz")
    cfg = SixDRegConfig(dtype="float32")
    img = jnp.zeros((1, 360, 270, 3), jnp.float32)
    rt = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1))
    counts = jnp.zeros((1, 3), jnp.float32)
    variables = _zeros_init(
        lambda: MapfreeRegression(cfg).init(
            jax.random.PRNGKey(0), img, img, rt, counts, train=False))
    result = run_parity(fixture, cfg, variables, atol=ATOL, rtol_max=RTOL_MAX)
    assert not result["skipped"], result
    assert result["ok"], result
