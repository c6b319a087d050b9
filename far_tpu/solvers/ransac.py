"""Batched prior-biased RANSAC, fully on-device.

TPU-native redesign of crockwell/far:
mp3d_loftr/third_party/prior_ransac/ransac.py:74-442. Differences that
make it a good XLA program rather than a translation:

- static shapes: N correspondences ride with a validity mask; the
  hypothesis batch is a fixed ``num_hypotheses``;
- weighted sampling uses the Gumbel-top-k trick (exact sampling without
  replacement) instead of a host-side ``np.random.choice`` round-trip
  (reference ransac.py:161-175);
- the minimal solver is the batched weighted 8-point (XLA eigh/SVD)
  rather than a per-sample cv2 LMEDS python loop (reference
  cv_geometry.py:836-859 — the slowest piece of the reference demo path);
- verification, prior transport scoring and the final cheirality-based
  pose recovery are all vectorized over the 2048 hypotheses.

Scoring matches the reference semantics: score = #inliers + prior term,
prior term = -err^2 / lambda with err the min point-cloud transport
error over the two rotation candidates (reference ransac.py:394-399 with
use_noexp_prior_scoring=True).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from far_tpu.geometry.epipolar import (
    decompose_essential_matrix,
    essential_from_pose34,
    sampson_epipolar_distance,
    symmetrical_epipolar_distance,
)
from far_tpu.geometry.fivepoint import run_5point_essential
from far_tpu.geometry.solvers import (
    fast_decompose_essential,
    recover_pose_from_essential,
    run_8point,
    run_8point_essential,
)
from far_tpu.solvers.types import PoseEstimate, PriorParams

# elimination passes per 5-point sample (see fivepoint._basis_rotations)
_FIVEPT_ROTATIONS = 2


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Static RANSAC configuration (hashable — safe as a jit static arg)."""

    num_hypotheses: int = 2048   # reference batch_size=2048 (metrics.py:122)
    minimal_solver: str = "8pt"  # '8pt' (sample 8, one hypothesis each) or
                                 # '5pt' (Nister: sample 5, up to 20
                                 # hypotheses each — num_hypotheses is the
                                 # TOTAL hypothesis budget either way)
    inl_th: float = 3e-7         # squared sampson on normalized coords
    prior_lambda: float = 0.3    # reference metrics.py:112
    bias_sigma_sq: float = 0.1   # reference metrics.py:123
    use_prior_scoring: bool = True
    use_biased_sampling: bool = True
    distance_thresh: float = 1e9
    error_fn: str = "sampson"    # or "symmetric"
    scoring: str = "inlier"      # 'inlier' (hard threshold count, the
                                 # reference prior_ransac semantics) or
                                 # 'magsac' (sigma-marginalized soft
                                 # count — the cv2.USAC_MAGSAC-style
                                 # scoring the reference mapfree solver
                                 # uses, pose_solver.py:81-83)
    magsac_levels: int = 8       # sigma discretization of the marginal
    fivept_det_tol: float = 2.5e-2  # |det E| candidate filter of the 5pt
                                 # solver; loosen for high-noise datasets
    min_valid: int = 8           # below this the solve is flagged failed
    linalg: str = "fast"         # 'fast' (SVD-free power-iteration paths,
                                 # the TPU production setting) or 'exact'
    polish: bool = True          # final weighted LS re-fit on the winning
                                 # inliers (exact, per-pair batch only)


def _sample_indices(
    key: jax.Array, logw: jnp.ndarray, num_hyp: int, sample_size: int
) -> jnp.ndarray:
    """Weighted sampling WITH replacement via inverse-CDF.

    Matches the reference's np.random.choice(replace=True) semantics
    (ransac.py:169). The inverse CDF is evaluated as a vectorized
    compare-and-count — the Gumbel-top-k alternative costs a slow TPU
    top_k over num_hyp * N lanes (~17 ms/batch at production sizes vs
    ~2 ms for this).

    Memory bound: the compare materializes (B, num_hyp, S, N) bools —
    0.13 GB at the production worst case (B=16, H=2048, S=8, N=512) and
    quadratic-free, but it scales linearly in N: past N ~= 16k
    correspondences (4 GB) a segmented scan over N-chunks would be
    needed. Production N is capped at MatchConfig.max_matches (512),
    far below that; the static assert below documents the ceiling.

    Args:
        logw: (B, N) log sampling weights (-inf for invalid points).
    Returns:
        (B, num_hyp, sample_size) int32 indices.
    """
    B, N = logw.shape
    assert B * num_hyp * sample_size * N < 2**33, (
        "inverse-CDF sampler compare tensor would exceed ~8 GB; "
        "chunk the N axis before raising MAX_MATCHES this far"
    )
    w = jnp.exp(logw - jnp.max(logw, axis=-1, keepdims=True))
    cdf = jnp.cumsum(w, axis=-1)
    total = cdf[:, -1:]
    u = jax.random.uniform(key, (B, num_hyp, sample_size), jnp.float32)
    u = u * total[:, :, None]
    # index = #{cdf < u}; cdf is monotone so a sum of compares inverts it
    idx = jnp.sum(
        (cdf[:, None, None, :] < u[..., None]).astype(jnp.int32), axis=-1
    )
    return jnp.minimum(idx, N - 1)


def _epipolar_error(cfg: RansacConfig, p1, p2, E):
    if cfg.error_fn == "symmetric":
        return symmetrical_epipolar_distance(p1, p2, E, squared=True)
    return sampson_epipolar_distance(p1, p2, E, squared=True)


def _prior_transport_error(
    E: jnp.ndarray, prior: PriorParams, linalg: str = "fast"
) -> jnp.ndarray:
    """Min point-cloud transport error between hypothesis poses and prior.

    Reference: RANSAC.get_prior_estimate + compute_RT_error
    (prior_ransac/ransac.py:190-229). Uses +t for both rotation
    candidates, and a unit-normalized prior translation.

    Args:
        E: (B, H, 3, 3); prior.rt: (B, 3, 4); prior.pcl: (P, 3).
    Returns:
        (B, H) transport errors.
    """
    if linalg == "fast":
        R1, R2, t = fast_decompose_essential(E)
    else:
        R1, R2, t = decompose_essential_matrix(E)  # (B, H, 3, 3) x2
    prior_R = prior.rt[..., :3, :3]
    prior_t = prior.rt[..., :3, 3]
    prior_t = prior_t / (jnp.linalg.norm(prior_t, axis=-1, keepdims=True) + 1e-8)
    pcl = prior.pcl  # (P, 3)
    target = jnp.einsum("bij,pj->bpi", prior_R, pcl) + prior_t[:, None, :]

    def transport(R, t):
        moved = jnp.einsum("bhij,pj->bhpi", R, pcl) + t[..., None, :]
        return jnp.mean(jnp.abs(moved - target[:, None]), axis=(-1, -2))

    return jnp.minimum(transport(R1, t), transport(R2, t))


def prior_ransac(
    key: jax.Array,
    kp1: jnp.ndarray,
    kp2: jnp.ndarray,
    valid: jnp.ndarray,
    prior: Optional[PriorParams] = None,
    cfg: RansacConfig = RansacConfig(),
    inl_th: Optional[jnp.ndarray] = None,
) -> PoseEstimate:
    """Run one batched RANSAC round (the reference uses max_iter=1 too).

    Args:
        key: PRNG key.
        kp1/kp2: (B, N, 2) K-normalized correspondences (padded).
        valid: (B, N) bool validity mask of the padding.
        prior: optional pose prior (enables biased sampling + scoring).
        inl_th: optional (B,) traced per-pair inlier threshold overriding
            cfg.inl_th (used by the pixel-threshold path where the
            threshold depends on per-pair focal lengths).
    Returns:
        PoseEstimate with the best-hypothesis essential matrix, the
        recovered (R, t) by cheirality vote over RANSAC inliers, the
        inlier mask and loose/tight/ultra-tight counts.
    """
    B, N, _ = kp1.shape
    H = cfg.num_hypotheses
    if cfg.minimal_solver == "5pt":
        S, n_cand = 5, 10 * _FIVEPT_ROTATIONS
        n_samples = max(H // n_cand, 1)
    else:
        S, n_cand = 8, 1
        n_samples = H
    dtype = kp1.dtype
    validf = valid.astype(dtype)

    # ---- sampling weights -------------------------------------------------
    if prior is not None and cfg.use_biased_sampling:
        E_prior = essential_from_pose34(prior.rt)  # (B, 3, 3)
        prior_err = symmetrical_epipolar_distance(kp1, kp2, E_prior)
        # reference: exp(-err / sigma^2), additive 1e-4 floor (ransac.py:166-168)
        bias = jnp.exp(-prior_err / cfg.bias_sigma_sq) + 1e-4
        logw = jnp.where(valid, jnp.log(bias), -jnp.inf)
    else:
        logw = jnp.where(valid, 0.0, -jnp.inf)

    idx = _sample_indices(key, logw, n_samples, S)  # (B, n_samples, S)

    # ---- minimal solves ----------------------------------------------------
    take = lambda pts: jnp.take_along_axis(pts[:, None], idx[..., None], axis=2)
    kp1_s = take(kp1)  # (B, n_samples, S, 2)
    kp2_s = take(kp2)
    if cfg.minimal_solver == "5pt":
        E5, valid5 = run_5point_essential(
            kp1_s, kp2_s, n_basis_rotations=_FIVEPT_ROTATIONS,
            det_tol=cfg.fivept_det_tol,
        )  # (B, n_samples, n_cand, 3, 3)
        E = E5.reshape(B, n_samples * n_cand, 3, 3)
        finite = valid5.reshape(B, n_samples * n_cand) \
            & jnp.all(jnp.isfinite(E), axis=(-1, -2))
    elif cfg.linalg == "fast":
        E = run_8point_essential(kp1_s, kp2_s, impl="power")  # (B, H, 3, 3)
        finite = jnp.all(jnp.isfinite(E), axis=(-1, -2))  # (B, H)
    else:
        # Score UNPROJECTED rank-2 DLT hypotheses, as the reference does
        # (cv_geometry.py:772-834 zeroes the third singular value but
        # keeps the first two): projecting onto the essential manifold
        # here costs ~40% of the inliers on noisy minimal samples
        # (tests/crossval_ransac.py exposed the drift). Pose recovery
        # below re-projects via its SVD decomposition anyway.
        E = run_8point(kp1_s, kp2_s)  # (B, H, 3, 3) unit-Frobenius
        finite = jnp.all(jnp.isfinite(E), axis=(-1, -2))  # (B, H)

    # ---- verification -------------------------------------------------------
    thr = cfg.inl_th if inl_th is None else inl_th[:, None, None]
    errs = _epipolar_error(cfg, kp1[:, None], kp2[:, None], E)  # (B, H, N)
    inl = (errs <= thr) & valid[:, None]
    if cfg.scoring == "magsac":
        # MAGSAC-style sigma-marginalized quality (Barath et al.;
        # the scoring behind the reference mapfree cv2.USAC_MAGSAC,
        # pose_solver.py:81-83): marginalize the inlier indicator over
        # sigma in (0, sigma_max], discretized at L levels. Squared
        # errors scale as sigma^2, so level l's threshold is
        # thr * (l/L)^2. Points with tiny residuals count at every
        # level (weight 1); borderline points count fractionally —
        # model selection stops rewarding hypotheses that barely drag
        # outliers under one hard threshold. The reported inlier mask /
        # counts still use the hard threshold.
        L = cfg.magsac_levels
        score = jnp.zeros(errs.shape[:2], dtype)
        for lvl in range(1, L + 1):
            frac = (lvl / L) ** 2
            score = score + jnp.sum(
                ((errs <= thr * frac) & valid[:, None]).astype(dtype), -1)
        score = score / L  # (B, H) soft count in [0, #inliers]
    else:
        score = jnp.sum(inl.astype(dtype), axis=-1)  # (B, H)

    if prior is not None and cfg.use_prior_scoring:
        perr = _prior_transport_error(E, prior, cfg.linalg)
        score = score - perr ** 2 / cfg.prior_lambda

    score = jnp.where(finite, score, -jnp.inf)
    best = jnp.argmax(score, axis=-1)  # (B,)

    gather_h = lambda a: jnp.take_along_axis(
        a, best.reshape(B, *([1] * (a.ndim - 1))), axis=1
    ).squeeze(1)
    E_best = gather_h(E)            # (B, 3, 3)
    err_best = gather_h(errs)       # (B, N)
    inl_best = gather_h(inl)        # (B, N)

    # ---- polish: weighted LS re-fit over the winning inliers --------------
    # The 8-point-from-8 hypotheses (power-iteration, unprojected) are
    # noisier than the reference's Nister 5-point; one exact LS fit over
    # all inliers recovers the accuracy at per-pair (not per-hypothesis)
    # cost. Kept only where it does not lose inliers.
    if cfg.polish:
        w_inl = inl_best.astype(dtype)
        enough = jnp.sum(w_inl, -1, keepdims=True) >= 8
        w_safe = jnp.where(enough, w_inl, validf)
        E_pol = run_8point_essential(kp1, kp2, weights=w_safe, impl="eigh")
        errs_pol = _epipolar_error(cfg, kp1, kp2, E_pol)
        thr_pair = cfg.inl_th if inl_th is None else inl_th[:, None]
        inl_pol = (errs_pol <= thr_pair) & valid
        better = (jnp.sum(inl_pol.astype(dtype), -1) >= jnp.sum(w_inl, -1)) \
            & jnp.all(jnp.isfinite(E_pol), (-1, -2))
        E_best = jnp.where(better[:, None, None], E_pol, E_best)
        err_best = jnp.where(better[:, None], errs_pol, err_best)
        inl_best = jnp.where(better[:, None], inl_pol, inl_best)

    thr_b = thr if inl_th is None else inl_th[:, None]
    num_inl = jnp.sum(inl_best.astype(dtype), axis=-1)
    num_tight = jnp.sum(((err_best <= thr_b / 10.0) & valid).astype(dtype), -1)
    num_ultra = jnp.sum(((err_best <= thr_b / 100.0) & valid).astype(dtype), -1)

    # ---- pose recovery (recoverPose over RANSAC inliers) -------------------
    R, t, _, _ = recover_pose_from_essential(
        E_best, kp1, kp2, weights=inl_best.astype(dtype),
        distance_thresh=cfg.distance_thresh,
        method="fast" if cfg.linalg == "fast" else "svd",
    )

    success = jnp.sum(validf, axis=-1) >= cfg.min_valid
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    zed = jnp.zeros((B, 3), dtype)
    return PoseEstimate(
        E=jnp.where(success[:, None, None], E_best, eye),
        R=jnp.where(success[:, None, None], R, eye),
        t=jnp.where(success[:, None], t, zed),
        inliers=inl_best & success[:, None],
        num_inliers=num_inl * success.astype(dtype),
        num_tight=num_tight * success.astype(dtype),
        num_ultra_tight=num_ultra * success.astype(dtype),
        success=success,
    )
