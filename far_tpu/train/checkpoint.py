"""Checkpoint save/restore + curriculum parameter surgery (orbax).

Equivalent of the reference's checkpoint handling (SURVEY.md §5):
- step-tagged checkpoints with top-k retention + always-keep-latest
  (PL ModelCheckpoint, crockwell/far: mp3d_loftr/train.py:314-331)
- auto-resume from the newest checkpoint in a directory
  (interiornetStreetlearn_8ptVit/train.py:452-469)
- cross-phase "surgical" loading: drop parameters whose shapes changed
  between curriculum phases (the reference deletes moe_predictor rows,
  lightning_loftr.py:56-75) — here any shape-mismatched leaf is
  re-initialized instead of crashing.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with the reference's retention semantics."""

    def __init__(self, directory, max_to_keep: int = 5,
                 best_fn_key: Optional[str] = None,
                 best_mode: str = "min"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m[best_fn_key]) if best_fn_key else None,
            best_mode=best_mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> None:
        self._mgr.save(
            step, args=ocp.args.StandardSave(state),
            metrics=metrics or {},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore without a structure template (plain nested dicts of
        numpy arrays). Needed when the consumer holds only a *subtree*
        of the saved state — e.g. evaluation restoring params +
        batch_stats out of a full TrainState checkpoint (orbax
        StandardRestore rejects partial templates)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def close(self):
        self._mgr.close()


def surgical_load(
    restored_params: Any, template_params: Any, verbose: bool = True
) -> Tuple[Any, list]:
    """Merge a restored param tree into a template, skipping leaves whose
    shape changed (curriculum phase transitions) or that are missing.

    Returns (merged_params, list of skipped key paths).
    """
    skipped = []

    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template_params)
    restored_flat = dict(
        jax.tree_util.tree_flatten_with_path(restored_params)[0]
    )

    merged = []
    for path, leaf in flat_t:
        cand = restored_flat.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            merged.append(cand)
        else:
            skipped.append(jax.tree_util.keystr(path))
            merged.append(leaf)
    if verbose and skipped:
        print(f"[surgical_load] re-initialized {len(skipped)} leaves: "
              f"{skipped[:8]}{'...' if len(skipped) > 8 else ''}")
    return jax.tree_util.tree_unflatten(treedef, merged), skipped


@dataclasses.dataclass(frozen=True)
class CurriculumPhase:
    """One phase of the FAR training curriculum.

    The reference trains Matterport in 4 phases
    (mp3d_loftr/scripts/train_matterport.sh): correspondences-only,
    +RT regression (no MoE), +MoE gating, +prior refinement. Each phase
    tweaks loss weights/flags and warm-starts from the previous phase's
    checkpoint via surgical loading.
    """

    name: str
    epochs: int
    regress_rt: bool
    use_simple_moe: bool
    solver: str
    rt_weight_rot: float
    rt_weight_tr: float
    coarse_weight: float = 1.0
    fine_weight: float = 1.0


MATTERPORT_CURRICULUM = (
    CurriculumPhase("correspondence", 100, False, False, "ransac", 0.0, 0.0),
    CurriculumPhase("rt_regression", 100, True, False, "ransac", 1.0, 1.0),
    CurriculumPhase("moe_fusion", 100, True, True, "ransac", 1.0, 1.0),
    CurriculumPhase("prior_refine", 50, True, True, "prior_ransac", 1.0, 1.0),
)

MAPFREE_CURRICULUM = (
    CurriculumPhase("regression", 30, True, False, "ransac", 1.0, 1.0,
                    coarse_weight=0.0, fine_weight=0.0),
    CurriculumPhase("moe_fusion", 15, True, True, "ransac", 1.0, 1.0,
                    coarse_weight=0.0, fine_weight=0.0),
    CurriculumPhase("prior_refine", 5, True, True, "prior_ransac", 1.0, 1.0,
                    coarse_weight=0.0, fine_weight=0.0),
)


def apply_phase(cfg, phase: CurriculumPhase):
    """Produce the FARConfig for a curriculum phase."""
    import dataclasses as dc

    return dc.replace(
        cfg,
        regress_rt=phase.regress_rt,
        regress=dc.replace(cfg.regress, use_simple_moe=phase.use_simple_moe),
        solver=dc.replace(cfg.solver, solver=phase.solver),
        loss=dc.replace(
            cfg.loss,
            rt_weight_rot=phase.rt_weight_rot,
            rt_weight_tr=phase.rt_weight_tr,
            coarse_weight=phase.coarse_weight,
            fine_weight=phase.fine_weight,
        ),
    )
