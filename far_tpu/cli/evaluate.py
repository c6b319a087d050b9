"""Evaluation CLI.

Equivalent of crockwell/far: mp3d_loftr/test.py + scripts/eval_*.sh:
runs the full FAR loop over an eval split, gathers metrics across hosts,
prints the Matterport (or InteriorNet/StreetLearn) aggregation table and
writes the reference's artifacts: results_{solver}.txt, error CDF .npy,
pred_R.npy / pred_t.npy.

    python -m far_tpu.cli.evaluate --dataset synthetic --image_size 64x64
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.data import Loader
from far_tpu.data.sampler import sequential_indices
from far_tpu.eval.metrics import (
    aggregate_metrics,
    aggregate_metrics_interiornet_streetlearn,
    relative_pose_error,
)
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
from far_tpu.pipeline import far_forward, init_model
from far_tpu.train.checkpoint import CheckpointManager
from far_tpu.utils.cli import add_common_args, apply_overrides, build_dataset
from far_tpu.utils.config import FARConfig


def _check_batch_intrinsics(batch, cfg: FARConfig = None) -> None:
    """Host-side guard mirroring the reference's per-batch intrinsics
    assertion (vision_transformer.py:115-127): the epipolar positional
    basis is built once per config, so both frames must share intrinsics
    with the principal point at the image center — AND those intrinsics
    must be the ones the config's basis was built for.

    The basis normalization depends only on the unit-free ratios fx/cx
    and fy/cy (regressor.epipolar_positional_basis:63-70), so the batch
    pixel K is compared against the config's grid-unit constants
    directly. Tolerance is 15%: the production mp3d constants divide fx
    by 9 where the true stride is 8 (transformer.py:195 — a trained-in
    convention, an 11% deviation that must pass), while a genuinely
    different camera (e.g. fx/cx 1.0 vs Matterport's 1.6) deviates far
    beyond it and raises instead of silently corrupting EMM features.
    """
    K0 = np.asarray(batch.K0)
    K1 = np.asarray(batch.K1)
    if not np.allclose(K0, K1, rtol=1e-3):
        raise ValueError(
            "per-pair intrinsics differ between frames; the epipolar "
            "positional basis (RegressConfig.grid_fx/grid_fy) assumes "
            "shared intrinsics")
    if cfg is None:
        return
    gh, gw = cfg.coarse_hw
    cfg_fx_ratio = cfg.regress.grid_fx / (gw / 2.0)
    cfg_fy_ratio = cfg.regress.grid_fy / (gh / 2.0)
    fx_ratio = K0[:, 0, 0] / np.maximum(K0[:, 0, 2], 1e-6)
    fy_ratio = K0[:, 1, 1] / np.maximum(K0[:, 1, 2], 1e-6)
    tol = 0.15
    bad_fx = np.abs(fx_ratio / cfg_fx_ratio - 1.0) > tol
    bad_fy = np.abs(fy_ratio / cfg_fy_ratio - 1.0) > tol
    if np.any(bad_fx) or np.any(bad_fy):
        raise ValueError(
            f"batch intrinsics (fx/cx={float(fx_ratio[0]):.3f}, "
            f"fy/cy={float(fy_ratio[0]):.3f}) do not match the epipolar "
            f"basis constants (config fx/cx={cfg_fx_ratio:.3f}, "
            f"fy/cy={cfg_fy_ratio:.3f}); set "
            "--set regress.grid_fx/grid_fy for this camera or the EMM "
            "features will be silently wrong")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="far_tpu evaluator")
    add_common_args(p)
    p.add_argument("--model", default="far", choices=["far", "vitess"],
                   help="far = full FAR loop (mp3d_loftr/test.py); vitess ="
                        " 8pt-ViT geodesic eval (interiornetStreetlearn_"
                        "8ptVit/test_streetlearn_interiornet.py)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--out_dir", default="/tmp/far_tpu_eval")
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--agg", default="matterport",
                   choices=["matterport", "interiornet_streetlearn"])
    p.add_argument("--solver_pose_npz", default=None,
                   help="[vitess] cached solver poses for the FAR-gated "
                        "model (npz with 'rt' (N,3,4) + 'num_corr' (N,))")
    return p.parse_args(argv)


def _restore_variables(ckpt_dir, variables):
    """Pull params/batch_stats out of a saved TrainState checkpoint.

    Checkpoints store the full TrainState (step/params/batch_stats/
    opt_state); eval holds only the variables subtree, so restore
    template-free and merge shape-checked (curriculum-surgery safe)."""
    from far_tpu.train.checkpoint import surgical_load

    mgr = CheckpointManager(ckpt_dir)
    raw = mgr.restore_raw()
    mgr.close()
    params, skipped = surgical_load(raw["params"], variables["params"])
    if skipped:
        raise ValueError(
            f"checkpoint params do not match the model config: {skipped[:8]}")
    out = {"params": params}
    if "batch_stats" in variables:
        out["batch_stats"], _ = surgical_load(
            raw.get("batch_stats", {}), variables["batch_stats"],
            verbose=False)
    return out


def main(argv=None):
    args = parse_args(argv)
    if args.model == "vitess":
        return _eval_vitess(args)
    H, W = (int(x) for x in args.image_size.split("x"))
    cfg = FARConfig(image_size=(H, W), dtype=args.dtype)
    cfg = apply_overrides(cfg, args.overrides)

    model, variables = init_model(cfg, seed=args.seed,
                                  batch_size=args.batch_size)
    if args.ckpt_dir:
        variables = _restore_variables(args.ckpt_dir, variables)

    fn = jax.jit(lambda v, b, k: far_forward(model, v, b, k, train=False))

    dataset = build_dataset(args)
    idx = sequential_indices(len(dataset), rank=jax.process_index(),
                             world_size=jax.process_count())
    loader = Loader(dataset, idx, args.batch_size, keep_meta=True)

    acc = {k: [] for k in ("identifiers", "R_errs", "t_errs", "t_errs_abs",
                           "successful_fits", "epi_errs", "gt_R", "pred_R",
                           "pred_t", "solver_R_errs", "solver_t_errs",
                           "solver_t_errs_abs")}
    max_m = cfg.match.max_matches
    key = jax.random.PRNGKey(args.seed)
    for bi, (batch, meta) in enumerate(loader):
        if args.max_batches and bi >= args.max_batches:
            break
        # synthetic smoke data invents its own K (0.8*max(H,W) focal);
        # the basis-constants check applies to real-camera datasets
        _check_batch_intrinsics(
            batch, None if args.dataset == "synthetic" else cfg)
        key, sub = jax.random.split(key)
        out = fn(variables, batch, sub)
        R = np.asarray(out.R)
        t = np.asarray(out.t)
        sR = np.asarray(out.solver_rt[..., :3, :3])
        st = np.asarray(out.solver_rt[..., :3, 3])
        T = np.asarray(batch.T_0to1)
        m = out.matches

        # per-match symmetric epipolar residuals against GT
        E_gt = essential_from_pose34(batch.T_0to1[:, :3, :4])
        p0 = normalize_kpts_by_K(m.mkpts0_f, batch.K0)
        p1 = normalize_kpts_by_K(m.mkpts1_f, batch.K1)
        epi = np.asarray(symmetrical_epipolar_distance(p0, p1, E_gt))
        valid = np.asarray(m.valid)

        for b in range(R.shape[0]):
            t_err, r_err, t_abs = relative_pose_error(T[b], R[b], t[b])
            st_err, sr_err, st_abs = relative_pose_error(T[b], sR[b], st[b])
            acc["identifiers"].append("#".join(meta["pair_names"][b]))
            acc["R_errs"].append(r_err)
            acc["t_errs"].append(t_err)
            acc["t_errs_abs"].append(t_abs)
            acc["solver_R_errs"].append(sr_err)
            acc["solver_t_errs"].append(st_err)
            acc["solver_t_errs_abs"].append(st_abs)
            acc["successful_fits"].append(float(np.asarray(out.success[b])))
            # pad to a fixed width so the array can ride the allgather
            e = np.full(max_m, np.nan, np.float32)
            ev = epi[b][valid[b]][:max_m]
            e[: len(ev)] = ev
            acc["epi_errs"].append(e)
            acc["gt_R"].append(T[b][:3, :3])
            acc["pred_R"].append(R[b])
            acc["pred_t"].append(t[b])

    # cross-host gather: every per-pair field rides a fixed-shape
    # allgather, INCLUDING identifiers (fixed-width bytes), so the
    # identifier dedup below operates on globally aligned arrays.
    gathered = all_gather_metrics({
        **{k: np.asarray(acc[k]) for k in acc if k != "identifiers"},
        "identifiers": encode_strings(acc["identifiers"]),
    })
    acc = {k: list(v) for k, v in gathered.items()}
    acc["identifiers"] = decode_strings(np.asarray(gathered["identifiers"]))
    acc["epi_errs"] = [e[~np.isnan(e)] for e in gathered["epi_errs"]]

    def agg(metrics):
        if args.agg == "matterport":
            return aggregate_metrics(metrics)
        return aggregate_metrics_interiornet_streetlearn(metrics)

    table = agg(acc)
    # solver-pose table (reference re-runs compute_pose_errors on the
    # RANSAC pose, metrics.py:230-303) — makes MoE gating quality visible
    solver_table = agg({**acc, "R_errs": acc["solver_R_errs"],
                        "t_errs": acc["solver_t_errs"],
                        "t_errs_abs": acc["solver_t_errs_abs"]})

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    solver = cfg.solver.solver
    (out_dir / f"results_{solver}.txt").write_text(
        "\n".join(f"{k}: {v}" for k, v in table.items()) + "\n")
    (out_dir / f"results_{solver}_solverpose.txt").write_text(
        "\n".join(f"{k}: {v}" for k, v in solver_table.items()) + "\n")
    np.save(out_dir / "error_cdf.npy",
            np.sort(np.maximum(acc["R_errs"], acc["t_errs"])))
    np.save(out_dir / "pred_R.npy", np.asarray(acc["pred_R"]))
    np.save(out_dir / "pred_t.npy", np.asarray(acc["pred_t"]))
    print(json.dumps({"fused": table, "solver": solver_table},
                     indent=2, default=float))
    return table


def _eval_vitess(args):
    """8pt-ViT geodesic eval (reference interiornetStreetlearn_8ptVit/
    test_streetlearn_interiornet.py:65-116): run ViTEss — optionally
    FAR-gated by cached solver poses, the reference's cached-LoFTR-preds
    scheme (train.py:96-117) — over the sorted eval pairs, then print and
    write the large/small-overlap geodesic rotation table (results.txt)
    plus pred_R.npy."""
    from far_tpu.models.vitess import ViTEss, ViTEssConfig
    from far_tpu.train.family_trainers import collate_vitess

    cfg = apply_overrides(ViTEssConfig(dtype=args.dtype), args.overrides)
    model = ViTEss(cfg)

    dataset = build_dataset(args)
    if cfg.use_loftr_gating:
        from far_tpu.data.datasets import SolverPoseDataset

        dataset = SolverPoseDataset(dataset, args.solver_pose_npz,
                                    seed=args.seed)

    idx = sequential_indices(len(dataset), rank=jax.process_index(),
                             world_size=jax.process_count())
    loader = Loader(dataset, idx, args.batch_size,
                    collate=collate_vitess, keep_meta=True)

    hw = np.asarray(dataset[0]["image0"]).shape[:2]
    images0 = jnp.zeros((args.batch_size, 2, *hw, 3), jnp.float32)
    sp = nc = None
    if cfg.use_loftr_gating:
        sp = jnp.tile(jnp.eye(3, 4)[None], (args.batch_size, 1, 1))
        nc = jnp.zeros((args.batch_size,), jnp.float32)
    init_fn = jax.jit(lambda k: model.init(k, images0, sp, nc, train=False))
    variables = init_fn(jax.random.PRNGKey(args.seed))
    if args.ckpt_dir:
        variables = _restore_variables(args.ckpt_dir, variables)

    fn = jax.jit(
        lambda v, im, s, n: model.apply(v, im, s, n, train=False))

    acc = {k: [] for k in ("identifiers", "gt_R", "pred_R",
                           "successful_fits", "epi_errs")}
    for bi, (batch, meta) in enumerate(loader):
        if args.max_batches and bi >= args.max_batches:
            break
        # production eval decodes the (un-normalized) 6d prediction with
        # the ROW convention (test_streetlearn_interiornet.py:278-283,
        # the losson6d + use_normalized_6d flag set) — NOT the model's
        # RotationContinuity column-convention matrix output, which the
        # reference also returns but only uses when losson6d is off
        _, R_col, pred_9d, _ = fn(variables, batch.images,
                                  batch.solver_rt, batch.solver_num_corr)
        if cfg.use_normalized_6d:
            from far_tpu.geometry.rotations import rotation_6d_to_matrix
            from far_tpu.models.vitess import VITESS_POSE_STATS

            mean, std = VITESS_POSE_STATS[cfg.dataset]
            un = np.asarray(pred_9d, np.float32) * std + mean
            R = np.asarray(rotation_6d_to_matrix(
                jnp.asarray(un[..., 3:])), np.float32)
        else:
            R = np.asarray(R_col, np.float32)
        T = np.asarray(batch.T_0to1)
        for b in range(R.shape[0]):
            acc["identifiers"].append("#".join(meta["pair_names"][b]))
            acc["gt_R"].append(T[b][:3, :3])
            acc["pred_R"].append(R[b])
            # regression always produces a pose; the fits column only
            # tracks solver health in the FAR family
            acc["successful_fits"].append(1.0)
            acc["epi_errs"].append(np.full(1, np.nan, np.float32))

    gathered = all_gather_metrics({
        **{k: np.asarray(acc[k]) for k in acc if k != "identifiers"},
        "identifiers": encode_strings(acc["identifiers"]),
    })
    acc = {k: list(v) for k, v in gathered.items()}
    acc["identifiers"] = decode_strings(np.asarray(gathered["identifiers"]))
    acc["epi_errs"] = [e[~np.isnan(e)] for e in gathered["epi_errs"]]

    table = aggregate_metrics_interiornet_streetlearn(acc)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "results.txt").write_text(
        "\n".join(f"{k}: {v}" for k, v in table.items()) + "\n")
    np.save(out_dir / "pred_R.npy", np.asarray(acc["pred_R"]))
    print(json.dumps(table, indent=2, default=float))
    return table


if __name__ == "__main__":
    main()
