import torch


def quaternion_to_rotation_matrix(quaternion: torch.Tensor) -> torch.Tensor:
    """(..., 4) (w, x, y, z) unit quaternion -> (..., 3, 3)."""
    q = quaternion / torch.linalg.norm(quaternion, dim=-1, keepdim=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)], -1),
        torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)], -1),
        torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)], -1),
    ]
    return torch.stack(rows, dim=-2)


def rotation_matrix_to_quaternion(matrix: torch.Tensor,
                                  eps: float = 1e-8,
                                  order=None) -> torch.Tensor:
    """(..., 3, 3) -> (..., 4) quaternion, (w, x, y, z) convention.

    Shepperd's method: pick the largest of the four squared components
    for numerical stability.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return torch.sqrt(torch.clamp(x, min=eps))

    qw_ = safe_sqrt(1.0 + tr) / 2.0
    qx_ = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    qy_ = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    qz_ = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0

    # candidate quaternions, one per dominant component
    c0 = torch.stack([qw_, (m21 - m12) / (4 * qw_),
                      (m02 - m20) / (4 * qw_), (m10 - m01) / (4 * qw_)], -1)
    c1 = torch.stack([(m21 - m12) / (4 * qx_), qx_,
                      (m01 + m10) / (4 * qx_), (m02 + m20) / (4 * qx_)], -1)
    c2 = torch.stack([(m02 - m20) / (4 * qy_), (m01 + m10) / (4 * qy_),
                      qy_, (m12 + m21) / (4 * qy_)], -1)
    c3 = torch.stack([(m10 - m01) / (4 * qz_), (m02 + m20) / (4 * qz_),
                      (m12 + m21) / (4 * qz_), qz_], -1)

    comps = torch.stack([qw_, qx_, qy_, qz_], -1)
    idx = torch.argmax(comps, dim=-1)
    cands = torch.stack([c0, c1, c2, c3], dim=-2)  # (..., 4 cand, 4)
    out = torch.gather(
        cands, -2, idx[..., None, None].expand(*idx.shape, 1, 4)
    ).squeeze(-2)
    return out / torch.linalg.norm(out, dim=-1, keepdim=True)
