"""Validation-during-training for the FAR family.

Equivalent of crockwell/far: mp3d_loftr/src/lightning/lightning_loftr.py
:266-323 (validation_epoch_end): a full pass over the val split, per-pair
pose errors + per-match epipolar residuals, cross-host gather, the
Matterport aggregation table, and match-figure dumps. The curriculum
checkpointing monitors this table's 'rot mean err' (reference
train.py:314-324 monitors the same signal).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from far_tpu.data import Loader
from far_tpu.data.sampler import sequential_indices
from far_tpu.eval.metrics import aggregate_metrics, relative_pose_error
from far_tpu.geometry.epipolar import (
    essential_from_pose34,
    symmetrical_epipolar_distance,
)
from far_tpu.geometry.transforms import normalize_kpts_by_K
from far_tpu.parallel.comm import (
    all_gather_metrics,
    decode_strings,
    encode_strings,
)


def validate_far(
    eval_fn,
    variables,
    dataset,
    batch_size: int,
    key,
    max_matches: int,
    max_batches: int = 0,
    fig_dir: Optional[str] = None,
    n_figs: int = 2,
    step: int = 0,
) -> Dict:
    """One validation pass -> the Matterport aggregation table.

    Args:
        eval_fn: jitted (variables, batch, key) -> FarOutput.
        fig_dir: when set, dumps match figures for the first batch
            (reference logs figures per val epoch, lightning_loftr.py:305).
    Returns:
        dict table incl. 'rot mean err' (the checkpoint monitor signal).
    """
    idx = sequential_indices(len(dataset), rank=jax.process_index(),
                             world_size=jax.process_count())
    loader = Loader(dataset, idx, batch_size, keep_meta=True)

    acc = {k: [] for k in ("identifiers", "R_errs", "t_errs", "t_errs_abs",
                           "successful_fits", "epi_errs")}
    for bi, (batch, meta) in enumerate(loader):
        if max_batches and bi >= max_batches:
            break
        key, sub = jax.random.split(key)
        out = eval_fn(variables, batch, sub)
        R = np.asarray(out.R)
        t = np.asarray(out.t)
        T = np.asarray(batch.T_0to1)
        m = out.matches

        E_gt = essential_from_pose34(batch.T_0to1[:, :3, :4])
        p0 = normalize_kpts_by_K(m.mkpts0_f, batch.K0)
        p1 = normalize_kpts_by_K(m.mkpts1_f, batch.K1)
        epi = np.asarray(symmetrical_epipolar_distance(p0, p1, E_gt))
        valid = np.asarray(m.valid)

        if bi == 0 and fig_dir is not None and jax.process_index() == 0:
            from far_tpu.utils.plotting import make_matching_figures

            figs = make_matching_figures(out, batch, "validation", epi)
            d = Path(fig_dir)
            d.mkdir(parents=True, exist_ok=True)
            for i, fig in enumerate(figs["validation"][:n_figs]):
                fig.savefig(d / f"val_step{step:07d}_pair{i}.png", dpi=75)
                import matplotlib.pyplot as plt

                plt.close(fig)

        for b in range(R.shape[0]):
            t_err, r_err, t_abs = relative_pose_error(T[b], R[b], t[b])
            acc["identifiers"].append("#".join(meta["pair_names"][b]))
            acc["R_errs"].append(r_err)
            acc["t_errs"].append(t_err)
            acc["t_errs_abs"].append(t_abs)
            acc["successful_fits"].append(float(np.asarray(out.success[b])))
            e = np.full(max_matches, np.nan, np.float32)
            ev = epi[b][valid[b]][:max_matches]
            e[: len(ev)] = ev
            acc["epi_errs"].append(e)

    gathered = all_gather_metrics({
        **{k: np.asarray(acc[k]) for k in acc if k != "identifiers"},
        "identifiers": encode_strings(acc["identifiers"]),
    })
    acc = {k: list(v) for k, v in gathered.items()}
    acc["identifiers"] = decode_strings(np.asarray(gathered["identifiers"]))
    acc["epi_errs"] = [e[~np.isnan(e)] for e in gathered["epi_errs"]]
    return aggregate_metrics(acc)
