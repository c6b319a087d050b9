"""Canonical experiment presets.

The reference encodes its canonical hyper-parameters in shell drivers
(crockwell/far: mp3d_loftr/scripts/train_matterport.sh,
mapfree_6dreg/scripts/train_mapfree_loftr.sh,
interiornetStreetlearn_8ptVit/scripts/train_interiornet_t.sh). Here they
are declarative presets: (model config, optimizer config, curriculum).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from far_tpu.models.sixdreg import SixDRegConfig
from far_tpu.models.vitess import ViTEssConfig
from far_tpu.train.checkpoint import (
    MAPFREE_CURRICULUM,
    MATTERPORT_CURRICULUM,
    CurriculumPhase,
)
from far_tpu.train.optim import OptimConfig
from far_tpu.utils.config import FARConfig, MatchConfig, SolverOptions


@dataclasses.dataclass(frozen=True)
class ExperimentPreset:
    name: str
    model: object
    optim: OptimConfig
    curriculum: Tuple[CurriculumPhase, ...]
    batch_size: int
    notes: str = ""


def matterport() -> ExperimentPreset:
    """Matterport3D FAR training (reference train_matterport.sh):
    10 GPUs x bs 1, canonical lr 6e-3 @ bs 64, adamw, 4-phase
    curriculum, MultiStepLR, 4800-step warmup."""
    return ExperimentPreset(
        name="matterport_far",
        model=FARConfig(
            image_size=(480, 640),
            solver=SolverOptions(solver="prior_ransac", fine_pred_steps=2),
            dtype="bfloat16",
        ),
        optim=OptimConfig(
            optimizer="adamw", lr=6e-3, adamw_decay=0.1,
            warmup_steps=4800, scheduler="multistep",
            mslr_milestones=(3, 6, 9, 12), mslr_gamma=0.5, grad_clip=0.5,
        ),
        curriculum=MATTERPORT_CURRICULUM,
        batch_size=64,
        notes="lr scales linearly with global batch / 64 "
              "(reference train.py:199-211)",
    )


def interiornet(variant: str = "T") -> ExperimentPreset:
    """8pt-ViT extreme-rotation training (reference
    train_interiornet_t.sh): 120k steps, bs 6, Adam 5e-4 OneCycle."""
    return ExperimentPreset(
        name=f"interiornet_{variant}_vitess",
        model=ViTEssConfig(
            dataset="interiornet_T" if variant == "T" else "interiornet",
            use_loftr_gating=True, dtype="bfloat16",
        ),
        optim=OptimConfig(
            optimizer="adam", lr=5e-4, warmup_steps=0,
            scheduler="onecycle", onecycle_total_steps=120_000,
            grad_clip=1.0,
        ),
        curriculum=(
            CurriculumPhase("vit", 1, True, False, "prior_ransac_noprior",
                            1.0, 1.0, coarse_weight=0.0, fine_weight=0.0),
        ),
        batch_size=6,
    )


def streetlearn(variant: str = "T") -> ExperimentPreset:
    p = interiornet(variant)
    return dataclasses.replace(
        p,
        name=f"streetlearn_{variant}_vitess",
        model=dataclasses.replace(
            p.model,
            dataset="streetlearn_T" if variant == "T" else "streetlearn"),
    )


def mapfree() -> ExperimentPreset:
    """Map-free 6DReg + LoFTR + prior training (reference
    train_mapfree_loftr.sh + rot6d_trans_with_loftr.yaml): 4 GPUs,
    bs 24, Adam 1e-5, 3-phase curriculum, scene-balanced sampler 700."""
    return ExperimentPreset(
        name="mapfree_6dreg_loftr",
        model=SixDRegConfig(dtype="bfloat16"),
        optim=OptimConfig(
            optimizer="adam", lr=1e-5, warmup_steps=0, scheduler="none",
            grad_clip=1.0,
        ),
        curriculum=MAPFREE_CURRICULUM,
        batch_size=24,
        notes="scene_balance sampler, 700 samples/scene with replacement; "
              "overlap filter [0.4, 0.8]",
    )


PRESETS = {
    "matterport": matterport,
    "interiornet": interiornet,
    "streetlearn": streetlearn,
    "mapfree": mapfree,
}
