"""kornia.geometry.epipolar.fundamental shim."""

import torch


def fundamental_from_essential(E_mat, K1, K2):
    """F = K2^-T E K1^-1 (kornia semantics)."""
    return torch.inverse(K2).transpose(-2, -1) @ E_mat @ torch.inverse(K1)
