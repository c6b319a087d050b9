"""Training CLI.

Equivalent of crockwell/far: mp3d_loftr/train.py + mapfree_6dreg/train.py
(PL Trainer setups) — a data-parallel training loop over a device mesh
with warm-up, NaN-grad skipping, scene-balanced sampling, periodic
checkpointing and JSONL/TensorBoard logging. Runs out of the box on the
synthetic dataset:

    python -m far_tpu.cli.train --dataset synthetic --steps 20 \
        --image_size 64x64 --set match.max_matches=128
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--scheduler", default="none")
    p.add_argument("--sampler", default="scene_balance",
                   choices=["scene_balance", "random", "sequential"])
    p.add_argument("--n_samples_per_scene", type=int, default=200)
    p.add_argument("--ckpt_dir", default="/tmp/far_tpu_ckpt")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_dir", default="/tmp/far_tpu_logs")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    H, W = (int(x) for x in args.image_size.split("x"))
    cfg = FARConfig(image_size=(H, W), dtype=args.dtype)
    cfg = apply_overrides(cfg, args.overrides)

    dataset = build_dataset(args)
    # canonical-LR linear scaling by world size (reference train.py:199-211)
    world = jax.device_count()
    lr = args.lr * world * args.batch_size / 64.0 \
        if args.scheduler != "none" else args.lr

    trainer = Trainer(cfg, OptimConfig(
        lr=lr, warmup_steps=args.warmup_steps, scheduler=args.scheduler,
    ))
    state = trainer.init(seed=args.seed, batch_size=args.batch_size)

    mgr = CheckpointManager(args.ckpt_dir)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {mgr.latest_step()}")

    logger = MetricLogger(args.log_dir, "train",
                          rank=jax.process_index(),
                          print_every=args.log_every)

    if args.sampler == "scene_balance" and hasattr(dataset, "scene_lengths"):
        indices = scene_balance_indices(
            dataset.scene_lengths, args.n_samples_per_scene, args.seed)
    elif args.sampler == "random":
        indices = random_indices(len(dataset), seed=args.seed)
    else:
        indices = np.arange(len(dataset))

    key = jax.random.PRNGKey(args.seed)
    step = int(state.step)
    t0 = time.time()
    metrics = {"loss": np.nan}
    while step < args.steps:
        loader = Loader(dataset, indices, args.batch_size)
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
            if step % args.ckpt_every == 0 or step == args.steps:
                mgr.save(step, jax.device_get(state))
    logger.close()
    mgr.close()
    print(f"done: {step} steps, final loss "
          f"{float(np.asarray(metrics['loss'])):.4f}")


if __name__ == "__main__":
    main()
