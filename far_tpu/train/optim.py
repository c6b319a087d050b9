"""Optimizer / schedule factories (optax).

Equivalent of crockwell/far: mp3d_loftr/src/optimizers/__init__.py
(adam/adamw + MultiStep/Cosine/Exponential/OneCycle schedulers) plus the
reference's two training crutches, expressed as optax transforms:
- linear LR warm-up (lightning_loftr.py:95-111)
- NaN/Inf gradient skip (lightning_loftr.py:113-124) via apply_if_finite
- global-norm gradient clipping (TRAINER.GRADIENT_CLIPPING=0.5)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adamw"          # 'adam' | 'adamw'
    lr: float = 6e-3                  # canonical lr (scaled by caller)
    adam_decay: float = 0.0
    adamw_decay: float = 0.1
    warmup_steps: int = 4800
    warmup_ratio: float = 0.0
    warmup_type: str = "linear"       # 'linear' | 'constant'
    scheduler: str = "multistep"      # 'multistep'|'cosine'|'exponential'|'onecycle'|'none'
    steps_per_epoch: int = 1000       # for epoch-interval schedules
    mslr_milestones: Sequence[int] = (3, 6, 9, 12)   # epochs
    mslr_gamma: float = 0.5
    cosa_tmax: int = 30               # epochs
    elr_gamma: float = 0.999992       # per step
    onecycle_total_steps: int = 120_000
    grad_clip: float = 0.5
    skip_nonfinite: bool = True


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    """LR schedule = warmup then the configured decay."""
    base = cfg.lr

    if cfg.scheduler == "multistep":
        boundaries = {
            int(m * cfg.steps_per_epoch): cfg.mslr_gamma
            for m in cfg.mslr_milestones
        }
        decay = optax.piecewise_constant_schedule(base, boundaries)
    elif cfg.scheduler == "cosine":
        decay = optax.cosine_decay_schedule(
            base, cfg.cosa_tmax * cfg.steps_per_epoch
        )
    elif cfg.scheduler == "exponential":
        decay = optax.exponential_decay(
            base, transition_steps=1, decay_rate=cfg.elr_gamma
        )
    elif cfg.scheduler == "onecycle":
        decay = optax.cosine_onecycle_schedule(
            transition_steps=cfg.onecycle_total_steps,
            peak_value=base,
            pct_start=0.01,
        )
    else:
        decay = optax.constant_schedule(base)

    if cfg.warmup_steps <= 0 or cfg.scheduler == "onecycle":
        return decay
    if cfg.warmup_type == "constant":
        warm = optax.constant_schedule(base * max(cfg.warmup_ratio, 1e-8))
    else:
        warm = optax.linear_schedule(
            base * cfg.warmup_ratio, base, cfg.warmup_steps
        )
    return optax.join_schedules([warm, decay], [cfg.warmup_steps])


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = build_schedule(cfg)
    if cfg.optimizer == "adamw":
        core = optax.adamw(sched, weight_decay=cfg.adamw_decay)
    else:
        core = optax.chain(
            optax.adam(sched),
            optax.add_decayed_weights(cfg.adam_decay)
            if cfg.adam_decay else optax.identity(),
        )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip else optax.identity(),
        core,
    )
    if cfg.skip_nonfinite:
        # reference semantics: drop the whole update on NaN/Inf grads
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    return tx
