"""Essential / fundamental matrix algebra and epipolar residuals.

Replaces crockwell/far: mp3d_loftr/third_party/prior_ransac/essential.py
(E<->F, decompose_essential_matrix, motion_from_essential) and kornia's
sampson / symmetrical epipolar distances with batched jnp versions that
run on TPU under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from far_tpu.geometry.transforms import to_homogeneous


def cross_product_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric [v]_x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(*v.shape[:-1], 3, 3)


def essential_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x R for the relative motion x2 ~ R x1 + t."""
    return jnp.matmul(cross_product_matrix(t), R)


def essential_from_pose34(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) relative pose -> essential matrix."""
    return essential_from_Rt(T[..., :3, :3], T[..., :3, 3])


def fundamental_from_essential(E: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """F = K2^-T E K1^-1 (Hartley/Zisserman 9.12)."""
    return jnp.swapaxes(jnp.linalg.inv(K2), -1, -2) @ E @ jnp.linalg.inv(K1)


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """E = K2^T F K1."""
    return jnp.swapaxes(K2, -1, -2) @ F @ K1


def _epipolar_terms(pts1: jnp.ndarray, pts2: jnp.ndarray, Fm: jnp.ndarray):
    """Epipolar line coefficients, fully elementwise.

    Returns (num, a, b, d, e) with
        (a, b, _) = F x1 (first two rows), (d, e, _) = F^T x2,
        num = x2^T F x1.

    Written as broadcast arithmetic rather than einsum on purpose: the
    RANSAC verifier evaluates these for 2048 hypotheses x 1024 points,
    and einsum would materialize (B, H, N, 3) intermediates (~400 MB) in
    HBM, while elementwise chains fuse into the final residual.

    pts1/pts2: (..., N, 2); Fm: (..., 3, 3). The F components are
    broadcast against the point dim (F gets a trailing singleton axis).
    """
    x1, y1 = pts1[..., 0], pts1[..., 1]
    x2, y2 = pts2[..., 0], pts2[..., 1]
    F = Fm[..., None]  # broadcast over the point dim

    a = F[..., 0, 0, :] * x1 + F[..., 0, 1, :] * y1 + F[..., 0, 2, :]
    b = F[..., 1, 0, :] * x1 + F[..., 1, 1, :] * y1 + F[..., 1, 2, :]
    c = F[..., 2, 0, :] * x1 + F[..., 2, 1, :] * y1 + F[..., 2, 2, :]
    num = x2 * a + y2 * b + c

    d = F[..., 0, 0, :] * x2 + F[..., 1, 0, :] * y2 + F[..., 2, 0, :]
    e = F[..., 0, 1, :] * x2 + F[..., 1, 1, :] * y2 + F[..., 2, 1, :]
    return num, a, b, d, e


def sampson_epipolar_distance(
    pts1: jnp.ndarray, pts2: jnp.ndarray, Fm: jnp.ndarray,
    squared: bool = True, eps: float = 1e-8,
) -> jnp.ndarray:
    """Batched Sampson distance (first-order geometric error).

    d = (x2^T F x1)^2 / (||(Fx1)_{:2}||^2 + ||(F^T x2)_{:2}||^2)
    """
    num, a, b, d, e = _epipolar_terms(pts1, pts2, Fm)
    denom = a ** 2 + b ** 2 + d ** 2 + e ** 2
    out = num ** 2 / (denom + eps)
    return out if squared else jnp.sqrt(jnp.maximum(out, 0.0))


def symmetrical_epipolar_distance(
    pts1: jnp.ndarray, pts2: jnp.ndarray, Fm: jnp.ndarray,
    squared: bool = True, eps: float = 1e-8,
) -> jnp.ndarray:
    """Batched symmetric epipolar distance.

    d = (x2^T F x1)^2 * (1/||(Fx1)_{:2}||^2 + 1/||(F^T x2)_{:2}||^2)

    Mirrors crockwell/far: mp3d_loftr/src/utils/metrics.py:39-56 on
    already-normalized points.
    """
    num, a, b, d, e = _epipolar_terms(pts1, pts2, Fm)
    inv = 1.0 / (a ** 2 + b ** 2 + eps) + 1.0 / (d ** 2 + e ** 2 + eps)
    out = num ** 2 * inv
    return out if squared else jnp.sqrt(jnp.maximum(out, 0.0))


def decompose_essential_matrix(
    E: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SVD decomposition of E into two rotations and a translation.

    Follows the classic Hartley/Zisserman recipe (the reference's version
    is crockwell/far: mp3d_loftr/third_party/prior_ransac/essential.py:99-139):
    E = U diag(1,1,0) V^T, R1 = U W V^T, R2 = U W^T V^T, t = u3, with
    U/V sign-fixed to be proper rotations.

    Args:
        E: (..., 3, 3)
    Returns:
        (R1, R2, t): (..., 3, 3), (..., 3, 3), (..., 3)
    """
    U, _, Vt = jnp.linalg.svd(E)
    # force det = +1 by flipping the last column/row
    flip_u = jnp.where(jnp.linalg.det(U) < 0.0, -1.0, 1.0)[..., None]
    flip_v = jnp.where(jnp.linalg.det(Vt) < 0.0, -1.0, 1.0)[..., None]
    U = U.at[..., :, -1].multiply(flip_u)
    Vt = Vt.at[..., -1, :].multiply(flip_v)

    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, -1]
    return R1, R2, t


def motion_from_essential(E: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All four candidate motions from E.

    Returns:
        Rs: (..., 4, 3, 3), ts: (..., 4, 3) in the order
        [R1,+t], [R1,-t], [R2,+t], [R2,-t].
    """
    R1, R2, t = decompose_essential_matrix(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts
