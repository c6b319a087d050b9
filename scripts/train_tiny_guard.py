#!/usr/bin/env python
"""Train the tiny FARLoFTR on synthetic data and save the checkpoint the
bench's network-quality guard replays (VERDICT r4 #7).

The throughput loop in bench.py runs a randomly initialized model, so
matcher/regressor perf work could silently break numerics. This script
trains the small config (the verify-skill dims) on synthetic pairs
until the matcher is meaningful, evaluates it on held-out scenes, and
writes assets/tiny_guard.npz: flattened params + batch_stats + the
config + the expected eval error. bench.py reloads it each run, repeats
the same eval, and asserts the pose error hasn't regressed.

Usage: python scripts/train_tiny_guard.py [--steps 300] [--cpu]
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

TINY_SETS = dict(
    image_size=(64, 64),
    backbone=dict(initial_dim=16, block_dims=(16, 24, 32)),
    coarse=dict(d_model=32, nhead=4, layer_names=("self", "cross") * 2),
    match=dict(thr=0.0, border_rm=1, max_matches=64),
    fine=dict(d_model=16, nhead=4),
    regress=dict(d_model=32, emm_heads=4, hidden=64),
    solver=dict(num_hypotheses=256),
)


def tiny_config(dtype="float32"):
    from far_tpu.utils.config import (
        AttentionStackConfig,
        BackboneConfig,
        FARConfig,
        FineConfig,
        MatchConfig,
        RegressConfig,
        SolverOptions,
    )

    return FARConfig(
        image_size=TINY_SETS["image_size"],
        backbone=BackboneConfig(**TINY_SETS["backbone"]),
        coarse=AttentionStackConfig(**TINY_SETS["coarse"]),
        match=MatchConfig(**TINY_SETS["match"]),
        fine=FineConfig(**TINY_SETS["fine"]),
        regress=RegressConfig(**TINY_SETS["regress"]),
        solver=SolverOptions(**TINY_SETS["solver"]),
        dtype=dtype,
    )


def guard_eval(variables, cfg, n=16, seed=4242):
    """Median rotation error of the full FAR loop on held-out synthetic
    scenes — deterministic given (variables, seed)."""
    import jax
    import jax.numpy as jnp

    from far_tpu.data import Loader, SyntheticPairDataset
    from far_tpu.models.loftr import FARLoFTR
    from far_tpu.pipeline import far_forward

    ds = SyntheticPairDataset(n=n, hw=cfg.image_size, seed=seed, n_scenes=n,
                              max_angle_deg=12.0)
    model = FARLoFTR(cfg)
    fn = jax.jit(lambda v, b, k: far_forward(model, v, b, k, train=False))
    errs = []
    for batch in Loader(ds, np.arange(n), batch_size=8, workers=1):
        out = fn(variables, batch, jax.random.PRNGKey(7))
        R_est = np.asarray(out.R, np.float64)
        R_gt = np.asarray(batch.T_0to1)[:, :3, :3].astype(np.float64)
        cosang = (np.einsum("bij,bij->b", R_est, R_gt) - 1) / 2
        errs.extend(np.degrees(np.arccos(np.clip(cosang, -1, 1))).tolist())
    return float(np.median(errs))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from far_tpu.data import Loader, SyntheticPairDataset
    from far_tpu.train.optim import OptimConfig
    from far_tpu.train.trainer import Trainer

    cfg = tiny_config()
    B = 8
    trainer = Trainer(cfg, OptimConfig(lr=4e-4, warmup_steps=20,
                                       scheduler="none"))
    state = trainer.init(seed=0, batch_size=B)
    ds = SyntheticPairDataset(n=64, hw=cfg.image_size, seed=0, n_scenes=8,
                              max_angle_deg=12.0)
    t0 = time.perf_counter()
    step = 0
    while step < args.steps:
        for batch in Loader(ds, np.arange(len(ds)), batch_size=B, workers=1):
            key = jax.random.fold_in(jax.random.PRNGKey(1), step)
            state, metrics = trainer.step(state, batch, key)
            step += 1
            if step % 50 == 0 or step == args.steps:
                print(f"step {step}: loss={float(metrics['loss']):.4f} "
                      f"nm={float(metrics.get('num_matches', 0)):.1f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            if step >= args.steps:
                break

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    err = guard_eval(variables, cfg)
    print(f"guard eval median rot err: {err:.3f} deg")

    out = Path(args.out or Path(__file__).resolve().parent.parent
               / "assets" / "tiny_guard.npz")
    out.parent.mkdir(parents=True, exist_ok=True)
    import jax.tree_util as jtu

    flat, _ = jtu.tree_flatten_with_path(variables)
    arrays = {jtu.keystr(path): np.asarray(leaf) for path, leaf in flat}
    arrays["__meta__"] = np.asarray(json.dumps(
        {"eval_rot_err_med_deg": round(err, 3), "steps": args.steps,
         "eval_seed": 4242}))
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.2f} MB)")


def load_guard(path):
    """(variables, meta, cfg) from a tiny_guard.npz."""
    import jax.tree_util as jtu

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    cfg = tiny_config()

    # rebuild the pytree: init a template for structure, fill by keystr
    import jax

    from far_tpu.pipeline import init_model

    with jax.default_device(jax.devices("cpu")[0]):
        _, template = init_model(cfg, seed=0, batch_size=1)
    template = {"params": template["params"],
                "batch_stats": template.get("batch_stats", {})}
    flat, treedef = jtu.tree_flatten_with_path(template)
    leaves = []
    for path_, leaf in flat:
        arr = z[jtu.keystr(path_)]
        assert arr.shape == np.asarray(leaf).shape, jtu.keystr(path_)
        leaves.append(arr)
    return jtu.tree_unflatten(treedef, leaves), meta, cfg


if __name__ == "__main__":
    main()
