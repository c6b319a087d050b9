"""Training CLI for all three model families.

Equivalent of crockwell/far: mp3d_loftr/train.py,
interiornetStreetlearn_8ptVit/train.py and mapfree_6dreg/train.py —
data-parallel training over a device mesh with warm-up, NaN-grad
skipping, scene-balanced sampling, periodic checkpointing,
validation-during-training with checkpoint-on-`rot mean err`
(lightning_loftr.py:266-323 + train.py:314-324) and JSONL/TensorBoard
logging. Runs out of the box on the synthetic dataset:

    python -m far_tpu.cli.train --dataset synthetic --steps 20 \
        --image_size 64x64 --set match.max_matches=128
    python -m far_tpu.cli.train --model vitess --dataset synthetic ...
    python -m far_tpu.cli.train --model sixdreg --dataset synthetic ...
    python -m far_tpu.cli.train --preset interiornet --dataset synthetic ...
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import numpy as np

from far_tpu.data import Loader, scene_balance_indices
from far_tpu.data.sampler import random_indices
from far_tpu.train.checkpoint import CheckpointManager
from far_tpu.train.optim import OptimConfig
from far_tpu.train.trainer import Trainer
from far_tpu.utils.cli import add_common_args, apply_overrides, build_dataset
from far_tpu.utils.config import FARConfig
from far_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="far_tpu trainer")
    add_common_args(p)
    p.add_argument("--model", default="far",
                   choices=["far", "vitess", "sixdreg"])
    p.add_argument("--preset", default=None,
                   help="configs.py preset name (matterport/interiornet/"
                        "streetlearn/mapfree); sets model family, model "
                        "config and optimizer defaults")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=None,
                   help="default: preset lr or 1e-4")
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--scheduler", default="none")
    p.add_argument("--sampler", default="scene_balance",
                   choices=["scene_balance", "random", "sequential"])
    p.add_argument("--subepochs", type=int, default=0,
                   help="split the index list into N shards and cycle "
                        "N-1 train shards + 1 val shard per epoch (the "
                        "8ptVit reference's subepoch scheme, N=11; "
                        "0 = plain per-epoch pass)")
    p.add_argument("--n_samples_per_scene", type=int, default=200)
    p.add_argument("--ckpt_dir", default="/tmp/far_tpu_ckpt")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_dir", default="/tmp/far_tpu_logs")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    # validation during training (far family; reference val loop)
    p.add_argument("--val_every", type=int, default=0,
                   help="run a val pass every N steps (0 = off)")
    p.add_argument("--val_n", type=int, default=16,
                   help="synthetic val-set size")
    p.add_argument("--val_max_batches", type=int, default=0)
    # vitess family
    p.add_argument("--w_tr", type=float, default=10.0)
    p.add_argument("--w_rot", type=float, default=10.0)
    p.add_argument("--solver_pose_npz", default=None,
                   help="cached solver poses for FAR-gated ViTEss training "
                        "(npz with 'rt' (N,3,4) + 'num_corr' (N,)); "
                        "default: GT+noise synthetic solver")
    # sixdreg family
    p.add_argument("--rot_loss", default="rot_6d_loss")
    p.add_argument("--trans_loss", default="trans_unnormalized_loss")
    p.add_argument("--lam", type=float, default=1.0)
    p.add_argument("--corr_max_matches", type=int, default=512)
    p.add_argument("--corr_noise_pix", type=float, default=1.0)
    p.add_argument("--corr_outlier_pct", type=float, default=0.1)
    p.add_argument("--corr_npz", default=None,
                   help="precomputed matcher shard (far_tpu.cli.precompute)"
                        " instead of GT-projected correspondences")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax.config.jax_debug_nans: re-run the step "
                        "de-optimized on the first NaN and raise with the "
                        "producing op (equivalent of torch "
                        "set_detect_anomaly, mapfree_6dreg/train.py:22). "
                        "Disables optax.apply_if_finite NaN-skipping so "
                        "the NaN is raised, not swallowed")
    return p.parse_args(argv)


def _resolve_family(args):
    """(family, model_cfg, optim_cfg) from --preset / --model / --set."""
    from far_tpu.models.sixdreg import SixDRegConfig
    from far_tpu.models.vitess import ViTEssConfig

    optim = None
    if args.preset:
        from far_tpu.configs import PRESETS

        preset = PRESETS[args.preset]()
        cfg = preset.model
        optim = preset.optim
        family = {"FARConfig": "far", "ViTEssConfig": "vitess",
                  "SixDRegConfig": "sixdreg"}[type(cfg).__name__]
    else:
        family = args.model
        if family == "far":
            H, W = (int(x) for x in args.image_size.split("x"))
            cfg = FARConfig(image_size=(H, W), dtype=args.dtype)
        elif family == "vitess":
            cfg = ViTEssConfig(dtype=args.dtype)
        else:
            cfg = SixDRegConfig(dtype=args.dtype)
    cfg = apply_overrides(cfg, args.overrides)

    if optim is None or args.lr is not None or args.scheduler != "none":
        optim = OptimConfig(
            lr=args.lr if args.lr is not None else 1e-4,
            warmup_steps=args.warmup_steps, scheduler=args.scheduler,
        )
    return family, cfg, optim


def _subepoch_indices(indices, subepochs, sub):
    """Shard `sub` of the reference's subepoch split: the index list is
    cut into `subepochs` equal shards; 0..subepochs-2 are train shards,
    the last is the val shard (streetlearn.py:69-71, train.py:227-247)."""
    n = len(indices) // subepochs
    return indices[sub * n: (sub + 1) * n]


def _build_trainer_and_loaderfn(args, family, cfg, optim):
    """Returns (trainer, make_loader(sub=None) -> iterable of batches)."""
    dataset = build_dataset(args)

    if args.sampler == "scene_balance" and hasattr(dataset, "scene_lengths"):
        indices = scene_balance_indices(
            dataset.scene_lengths, args.n_samples_per_scene, args.seed)
    elif args.sampler == "random":
        indices = random_indices(len(dataset), seed=args.seed)
    else:
        indices = np.arange(len(dataset))

    if family == "far":
        trainer = Trainer(cfg, optim)
        state = trainer.init(seed=args.seed, batch_size=args.batch_size)
        make_loader = lambda sub=None: Loader(
            dataset,
            indices if sub is None else _subepoch_indices(
                indices, args.subepochs, sub),
            args.batch_size)
        return trainer, state, make_loader

    if family == "vitess":
        from far_tpu.train.family_trainers import (
            ViTEssTrainer,
            collate_vitess,
        )

        if cfg.use_loftr_gating:
            # gated training needs a per-pair solver pose (the reference
            # loads cached LoFTR preds, train.py:96-117)
            from far_tpu.data.datasets import SolverPoseDataset

            dataset = SolverPoseDataset(dataset, args.solver_pose_npz,
                                        seed=args.seed)
        trainer = ViTEssTrainer(cfg, optim, w_tr=args.w_tr, w_rot=args.w_rot)
        probe = dataset[0]
        hw = np.asarray(probe["image0"]).shape[:2]
        state = trainer.init(seed=args.seed, batch_size=args.batch_size,
                             image_hw=hw)
        make_loader = lambda sub=None: Loader(
            dataset,
            indices if sub is None else _subepoch_indices(
                indices, args.subepochs, sub),
            args.batch_size, collate=collate_vitess)
        return trainer, state, make_loader

    # sixdreg: wrap the base dataset with a correspondence source
    from far_tpu.data.datasets import (
        CachedCorrespondenceDataset,
        GTCorrespondenceDataset,
    )
    from far_tpu.train.family_trainers import (
        SixDRegTrainer,
        collate_sixdreg,
    )

    if args.corr_npz:
        hw = np.asarray(dataset[0]["image0"]).shape[:2]
        dataset = CachedCorrespondenceDataset(
            dataset, args.corr_npz, max_matches=args.corr_max_matches,
            image_hw=hw, keep_images=True)
    else:
        dataset = GTCorrespondenceDataset(
            dataset, max_matches=args.corr_max_matches,
            noise_pix=args.corr_noise_pix,
            outlier_pct=args.corr_outlier_pct, seed=args.seed)
    trainer = SixDRegTrainer(
        cfg, optim, rot_loss=args.rot_loss, trans_loss=args.trans_loss,
        lam=args.lam)
    probe = dataset[0]
    hw = np.asarray(probe["image0"]).shape[:2]
    state = trainer.init(seed=args.seed, batch_size=args.batch_size,
                         image_hw=hw)
    make_loader = lambda sub=None: Loader(
        dataset,
        indices if sub is None else _subepoch_indices(
            indices, args.subepochs, sub),
        args.batch_size, collate=collate_sixdreg)
    return trainer, state, make_loader


def main(argv=None):
    args = parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    family, cfg, optim = _resolve_family(args)
    if args.debug_nans:
        # surface the NaN instead of skipping the update
        optim = dataclasses.replace(optim, skip_nonfinite=False)

    # canonical-LR linear scaling by world size (reference train.py:199-211)
    world = jax.device_count()
    if args.scheduler != "none" and family == "far":
        optim = dataclasses.replace(
            optim, lr=optim.lr * world * args.batch_size / 64.0)

    trainer, state, make_loader = _build_trainer_and_loaderfn(
        args, family, cfg, optim)

    mgr = CheckpointManager(args.ckpt_dir)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {mgr.latest_step()}")

    logger = MetricLogger(args.log_dir, "train",
                          rank=jax.process_index(),
                          print_every=args.log_every)

    # validation plumbing (far family; mirrors the reference val loop)
    val_fn = val_dataset = best_mgr = None
    best_rot_err = float("inf")
    if args.val_every and family == "far":
        from far_tpu.data.datasets import SyntheticPairDataset
        from far_tpu.pipeline import far_forward

        H, W = cfg.image_size
        val_dataset = SyntheticPairDataset(
            n=args.val_n, hw=(H, W), seed=args.seed + 7777)
        val_fn = jax.jit(lambda v, b, k: far_forward(
            trainer.model, v, b, k, train=False))

    key = jax.random.PRNGKey(args.seed)
    step = int(state.step)
    t0 = time.time()
    metrics = {"loss": np.nan}
    subepoch = 0
    while step < args.steps:
        if args.subepochs > 1:
            loader = make_loader(subepoch % (args.subepochs - 1))
        else:
            loader = make_loader()
        for batch in loader:
            if step >= args.steps:
                break
            key, sub = jax.random.split(key)
            state, metrics = trainer.step(state, batch, sub)
            step += 1
            if step % args.log_every == 0 or step == args.steps:
                scalars = {k: float(np.asarray(v))
                           for k, v in metrics.items()}
                scalars["steps_per_sec"] = step / (time.time() - t0)
                logger.log(step, scalars)
            if val_fn is not None and (step % args.val_every == 0
                                       or step == args.steps):
                from far_tpu.train.validation import validate_far

                key, vk = jax.random.split(key)
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                table = validate_far(
                    val_fn, variables, val_dataset, args.batch_size, vk,
                    max_matches=cfg.match.max_matches,
                    max_batches=args.val_max_batches,
                    fig_dir=f"{args.log_dir}/figures", step=step)
                logger.log(step, {f"val/{k}": float(v)
                                  for k, v in table.items()})
                # checkpoint-on-monitor (reference train.py:314-324)
                if table["rot mean err"] < best_rot_err:
                    best_rot_err = table["rot mean err"]
                    if best_mgr is None:
                        best_mgr = CheckpointManager(
                            f"{args.ckpt_dir}/best", max_to_keep=1)
                    best_mgr.save(step, jax.device_get(state))
            if step % args.ckpt_every == 0 or step == args.steps:
                mgr.save(step, jax.device_get(state))
        if args.subepochs > 1:
            subepoch += 1
            if (subepoch % (args.subepochs - 1) == 0
                    and hasattr(trainer, "eval_step") and step < args.steps):
                # reference: subepoch 10 is a full val-shard pass
                # (train.py:229-235); log the shard-mean loss metrics
                sums, count = {}, 0
                for vbatch in make_loader(args.subepochs - 1):
                    key, vk = jax.random.split(key)
                    vm = trainer.eval_step(state, vbatch, vk)
                    for k, v in vm.items():
                        sums[k] = sums.get(k, 0.0) + float(np.asarray(v))
                    count += 1
                if count:
                    logger.log(step, {f"val/{k}": v / count
                                      for k, v in sums.items()})
    logger.close()
    mgr.close()
    if best_mgr is not None:
        best_mgr.close()
    print(f"done: {step} steps, final loss "
          f"{float(np.asarray(metrics['loss'])):.4f}")


if __name__ == "__main__":
    main()
