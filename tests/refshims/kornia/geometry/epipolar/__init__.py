"""kornia.geometry.epipolar shim: the epipolar ops prior_ransac calls
at runtime, implemented in torch from kornia's documented semantics
(the same formulas as far_tpu.geometry.epipolar — a parity test pins
the two against each other)."""

import torch


def _to_homogeneous(pts):
    return torch.cat([pts, torch.ones_like(pts[..., :1])], dim=-1)


def _epipolar_terms(pts1, pts2, Fm):
    if pts1.shape[-1] == 2:
        pts1 = _to_homogeneous(pts1)
    if pts2.shape[-1] == 2:
        pts2 = _to_homogeneous(pts2)
    # line in image 2 of x1: F x1 ; line in image 1 of x2: F^T x2
    l2 = pts1 @ Fm.transpose(-2, -1)      # (..., N, 3) = (F x1)^T rows
    l1 = pts2 @ Fm                         # (..., N, 3) = (F^T x2)^T rows
    num = (pts2 * l2).sum(-1)
    return num, l2[..., 0], l2[..., 1], l1[..., 0], l1[..., 1]


def sampson_epipolar_distance(pts1, pts2, Fm, squared: bool = True,
                              eps: float = 1e-8):
    num, a, b, d, e = _epipolar_terms(pts1, pts2, Fm)
    out = num ** 2 / (a ** 2 + b ** 2 + d ** 2 + e ** 2 + eps)
    return out if squared else torch.sqrt(torch.clamp(out, min=0.0))


def symmetrical_epipolar_distance(pts1, pts2, Fm, squared: bool = True,
                                  eps: float = 1e-8):
    num, a, b, d, e = _epipolar_terms(pts1, pts2, Fm)
    inv = 1.0 / (a ** 2 + b ** 2 + eps) + 1.0 / (d ** 2 + e ** 2 + eps)
    out = num ** 2 * inv
    return out if squared else torch.sqrt(torch.clamp(out, min=0.0))


def cross_product_matrix(x):
    zero = torch.zeros_like(x[..., 0])
    m = torch.stack([
        zero, -x[..., 2], x[..., 1],
        x[..., 2], zero, -x[..., 0],
        -x[..., 1], x[..., 0], zero,
    ], dim=-1)
    return m.view(*x.shape[:-1], 3, 3)


def relative_camera_motion(R1, t1, R2, t2):
    R = R2 @ R1.transpose(-2, -1)
    t = t2 - R @ t1
    return R, t


def essential_from_Rt(R1, t1, R2, t2):
    """E = [t_rel]_x R_rel (Hartley/Zisserman 9.12), kornia convention
    (prior_ransac/essential.py:67-97 is the reference's local copy)."""
    R, t = relative_camera_motion(R1, t1, R2, t2)
    return cross_product_matrix(t[..., 0]) @ R


from kornia.geometry.epipolar import fundamental  # noqa: E402,F401
