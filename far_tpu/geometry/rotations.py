"""Rotation representations: 6D <-> matrix <-> quaternion, geodesics.

TPU-native replacement for the reference's scattered rotation utilities
(crockwell/far: mp3d_loftr/src/losses/loftr_loss.py:10-39,
interiornetStreetlearn_8ptVit RotationContinuity tools.py,
mapfree_6dreg/lib/utils/rotationutils.py) and for the numpy-quaternion /
scipy.spatial.transform dependencies. All ops are batched over leading
dimensions and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _normalize(v: jnp.ndarray, axis: int = -1, eps: float = _EPS) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. ortho-6D -> rotation matrix via Gram-Schmidt.

    Args:
        d6: (..., 6) continuous 6D rotation representation.
    Returns:
        (..., 3, 3) rotation matrices (rows are the orthonormal frame,
        matching the reference convention of stacking b1,b2,b3 as rows).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """First two rows of R flattened -> (..., 6)."""
    return R[..., :2, :].reshape(*R.shape[:-2], 6)


def ortho6d_to_matrix_rc(d6: jnp.ndarray) -> jnp.ndarray:
    """RotationContinuity's ``compute_rotation_matrix_from_ortho6d``.

    Same Gram-Schmidt frame as :func:`rotation_6d_to_matrix` but the
    orthonormal vectors become the COLUMNS of the matrix (the output is
    the transpose of the row convention). The reference uses BOTH
    conventions, so parity demands both here:

    - columns (this function): ViTEss's returned pose matrix
      (8ptVit RotationContinuity tools.py:47-60, model.py:214) and the
      mapfree DeepRes/Direct heads (rotationutils.py:32-53,
      head.py:243,277);
    - rows (:func:`rotation_6d_to_matrix`): the mp3d 6D loss
      (loftr_loss.py:10-29) and the mapfree FAR loop's decode
      (regression/model.py:25-31, 350).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    x = _normalize(a1)
    z = _normalize(jnp.cross(x, a2))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    q = _normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z).

    Branchless Shepperd-style selection: compute all four candidate
    quaternions and pick the numerically best by largest pivot, which is
    jit-friendly (no data-dependent python control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, _EPS)) * 2.0
        return jnp.stack([a(s), b(s), c(s), d(s)], axis=-1), t

    q0, p0 = _cand(
        1.0 + tr,
        lambda s: 0.25 * s,
        lambda s: (m21 - m12) / s,
        lambda s: (m02 - m20) / s,
        lambda s: (m10 - m01) / s,
    )
    q1, p1 = _cand(
        1.0 + m00 - m11 - m22,
        lambda s: (m21 - m12) / s,
        lambda s: 0.25 * s,
        lambda s: (m01 + m10) / s,
        lambda s: (m02 + m20) / s,
    )
    q2, p2 = _cand(
        1.0 - m00 + m11 - m22,
        lambda s: (m02 - m20) / s,
        lambda s: (m01 + m10) / s,
        lambda s: 0.25 * s,
        lambda s: (m12 + m21) / s,
    )
    q3, p3 = _cand(
        1.0 - m00 - m11 + m22,
        lambda s: (m10 - m01) / s,
        lambda s: (m02 + m20) / s,
        lambda s: (m12 + m21) / s,
        lambda s: 0.25 * s,
    )
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    ps = jnp.stack([p0, p1, p2, p3], axis=-1)  # (..., 4)
    idx = jnp.argmax(ps, axis=-1)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return _normalize(q)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) of a rotation matrix, batched."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(cos)


def geodesic_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between two rotations (radians), batched.

    Mirrors compute_geodesic_distance_from_two_matrices
    (crockwell/far: mp3d_loftr/src/utils/metrics.py:390-400).
    """
    return rotation_angle(jnp.matmul(R1, jnp.swapaxes(R2, -1, -2)))


def so3_project(M: jnp.ndarray) -> jnp.ndarray:
    """Project an arbitrary 3x3 matrix to the closest rotation (SVD)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.matmul(U, Vt))
    S = jnp.ones(M.shape[:-2] + (3,), M.dtype).at[..., -1].set(det)
    return jnp.matmul(U * S[..., None, :], Vt)
