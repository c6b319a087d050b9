"""Behavioral cross-validation: far_tpu prior-RANSAC vs the reference
engine (mp3d_loftr/third_party/prior_ransac/ransac.py) on identical
synthetic scenes and priors.

The reference engine runs its own pure-torch 8-point minimal solver
(model_type='fundamental' — cv_geometry.py:772-834) through the kornia
shims; ours runs in the matching configuration (8pt, symmetric error,
no polish). Everything else — biased sampling, prior transport scoring,
threshold conventions, loose/tight/ultra counting — is the semantics
under test. Pose recovery is shared (our recover_pose_from_essential on
both engines' E + inliers) so the comparison isolates the engine.

Production deltas accounted for: the reference production config uses
model_type='essential_cv2' (cv2 LMEDS Nister on 6-point samples,
metrics.py:114-130) whose backend needs OpenCV; its scoring/sampling
path is byte-identical to 'fundamental' except error_fn (sampson vs
symmetric) and sample size. Ours is additionally compared in its
production 5pt+polish configuration on the same scenes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class SceneParams:
    n_inliers: int = 150
    n_outliers: int = 50
    n_pad: int = 56
    noise: float = 1e-4
    inl_th: float = 3e-7         # squared symmetric dist, normalized coords
    prior_rot_jitter: float = 0.05   # radians of prior perturbation
    prior_t_jitter: float = 0.05


def _perturbed_prior(rng, R, t, p: SceneParams):
    """GT pose with small SO(3)/S2 jitter — a realistic solver prior."""
    import jax.numpy as jnp

    from far_tpu.geometry import so3_project

    w = rng.normal(size=3) * p.prior_rot_jitter
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    Rp = np.asarray(so3_project(jnp.asarray(
        (np.eye(3) + W) @ R, jnp.float32)))
    tp = t + rng.normal(size=3) * p.prior_t_jitter
    tp = tp / np.linalg.norm(tp)
    return np.hstack([Rp, tp[:, None]]).astype(np.float32)


def make_scenes(n_scenes: int, p: SceneParams, seed: int = 0):
    from tests.test_ransac import make_scene

    rng = np.random.default_rng(seed)
    scenes = []
    for _ in range(n_scenes):
        R, t, kp1, kp2, valid = make_scene(
            rng, n_inliers=p.n_inliers, n_outliers=p.n_outliers,
            n_pad=p.n_pad, noise=p.noise)
        prior_rt = _perturbed_prior(rng, R, t, p)
        scenes.append((R, t, kp1, kp2, valid, prior_rt))
    return scenes


def _pose_errors(R_gt, t_gt, R, t) -> Dict[str, float]:
    import jax.numpy as jnp

    from far_tpu.geometry import geodesic_distance

    r_err = float(np.degrees(float(geodesic_distance(
        jnp.asarray(R, jnp.float32), jnp.asarray(R_gt, jnp.float32)))))
    cos = float(np.dot(np.asarray(t).ravel(), t_gt)
                / max(np.linalg.norm(t), 1e-9))
    t_err = float(np.degrees(np.arccos(np.clip(abs(cos), -1.0, 1.0))))
    return {"r_err": r_err, "t_err": t_err}


def _recover(E, kp1, kp2, inliers) -> tuple:
    import jax.numpy as jnp

    from far_tpu.geometry import recover_pose_from_essential

    R, t, _, _ = recover_pose_from_essential(
        jnp.asarray(E, jnp.float32)[None],
        jnp.asarray(kp1, jnp.float32)[None],
        jnp.asarray(kp2, jnp.float32)[None],
        weights=jnp.asarray(inliers, jnp.float32)[None],
        distance_thresh=1e9, method="svd")
    return np.asarray(R[0]), np.asarray(t[0])


def run_reference(scenes, p: SceneParams, seed: int = 0) -> List[Dict]:
    """Drive the reference engine over the scenes (CPU torch)."""
    import torch

    from tests.refloader import _cpu_cuda_patch, load_reference_prior_ransac

    RANSAC = load_reference_prior_ransac()
    results = []
    with _cpu_cuda_patch():
        for i, (R, t, kp1, kp2, valid, prior_rt) in enumerate(scenes):
            np.random.seed(seed + i)   # reference samples via np.random
            torch.manual_seed(seed + i)
            prior_params = {
                "rotation_pcl_error": True,
                "rotation_error": False,
                "K1": torch.eye(3),
                "K2": torch.eye(3),
                "RT": torch.from_numpy(prior_rt.copy()),
                "pcl": torch.from_numpy(
                    np.random.uniform(-3, 3, (300, 3)).astype(np.float32)),
                "lambda": 0.3,
                "biased_sampling": "biased",
            }
            # the production flag set (mp3d_loftr/src/utils/metrics.py:
            # 100-131) modulo model_type — see module docstring
            engine = RANSAC(
                model_type="fundamental",
                max_iter=1,
                inl_th=p.inl_th,
                prior_params=prior_params,
                max_lo_iters=0,
                batch_size=2048,
                use_noexp_prior_scoring=True,
                use_linear_bias_sampling=True,
                bias_sigma_sq=0.1,
            )
            nv = int(valid.sum())
            kp1_t = torch.from_numpy(kp1[:nv].copy())
            kp2_t = torch.from_numpy(kp2[:nv].copy())
            E, mask, tight, ultra = engine.forward(kp1=kp1_t, kp2=kp2_t)
            E = E.numpy()
            mask = mask.numpy().ravel().astype(bool)
            full_mask = np.zeros(len(kp1), bool)
            full_mask[:nv] = mask[:nv] if mask.size >= nv else False
            Rr, tr = _recover(E, kp1, kp2, full_mask.astype(np.float32))
            res = _pose_errors(R, t, Rr, tr)
            res.update(
                n_inl=float(mask.sum()),
                n_tight=float(np.asarray(tight).sum()),
                n_ultra=float(np.asarray(ultra).sum()),
            )
            results.append(res)
    return results


def run_ours(scenes, p: SceneParams, seed: int = 0,
             production: bool = False) -> List[Dict]:
    """Drive far_tpu's engine; production=True uses the 5pt+polish
    config instead of the reference-matched 8pt one."""
    import jax
    import jax.numpy as jnp

    from far_tpu.solvers import PriorParams, RansacConfig, prior_ransac

    if production:
        cfg = RansacConfig(num_hypotheses=2048, inl_th=p.inl_th,
                           error_fn="symmetric")
    else:
        cfg = RansacConfig(
            num_hypotheses=2048, minimal_solver="8pt",
            error_fn="symmetric", inl_th=p.inl_th,
            polish=False, linalg="exact")

    kp1 = jnp.asarray(np.stack([s[2] for s in scenes]))
    kp2 = jnp.asarray(np.stack([s[3] for s in scenes]))
    valid = jnp.asarray(np.stack([s[4] for s in scenes]))
    prior_rt = jnp.asarray(np.stack([s[5] for s in scenes]))
    rng = np.random.default_rng(seed + 7)
    pcl = jnp.asarray(rng.uniform(-3, 3, (300, 3)).astype(np.float32))
    prior = PriorParams(rt=prior_rt, pcl=pcl)

    fn = jax.jit(lambda k, a, b, v, pr: prior_ransac(
        k, a, b, v, prior=pr, cfg=cfg))
    est = fn(jax.random.PRNGKey(seed), kp1, kp2, valid, prior)

    results = []
    for i, (R, t, *_rest) in enumerate(scenes):
        res = _pose_errors(R, t, np.asarray(est.R[i]), np.asarray(est.t[i]))
        res.update(
            n_inl=float(est.num_inliers[i]),
            n_tight=float(est.num_tight[i]),
            n_ultra=float(est.num_ultra_tight[i]),
        )
        results.append(res)
    return results


def summarize(results: List[Dict]) -> Dict[str, float]:
    keys = ["r_err", "t_err", "n_inl", "n_tight", "n_ultra"]
    out = {}
    for k in keys:
        vals = np.asarray([r[k] for r in results])
        out[f"med_{k}"] = float(np.median(vals))
        out[f"mean_{k}"] = float(np.mean(vals))
    return out


def crossval(n_scenes: int = 50, p: Optional[SceneParams] = None,
             seed: int = 0, production_too: bool = False):
    p = p or SceneParams()
    scenes = make_scenes(n_scenes, p, seed)
    ref = summarize(run_reference(scenes, p, seed))
    ours = summarize(run_ours(scenes, p, seed))
    out = {"reference": ref, "ours_8pt": ours}
    if production_too:
        out["ours_5pt_polish"] = summarize(
            run_ours(scenes, p, seed, production=True))
    return out
