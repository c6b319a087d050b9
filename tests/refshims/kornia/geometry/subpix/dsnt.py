import torch

from kornia.utils.grid import create_meshgrid


def spatial_expectation2d(input: torch.Tensor,
                          normalized_coordinates: bool = True
                          ) -> torch.Tensor:
    """Expected (x, y) under per-map probabilities.

    input: (B, N, H, W) probability maps (rows sum to 1).
    Returns (B, N, 2).
    """
    B, N, H, W = input.shape
    grid = create_meshgrid(H, W, normalized_coordinates,
                           device=input.device, dtype=input.dtype)
    grid = grid.reshape(1, 1, H * W, 2)
    p = input.reshape(B, N, H * W, 1)
    return torch.sum(p * grid, dim=2)
