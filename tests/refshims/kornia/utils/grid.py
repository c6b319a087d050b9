import torch


def create_meshgrid(height: int, width: int,
                    normalized_coordinates: bool = True,
                    device=None, dtype=None) -> torch.Tensor:
    """(1, H, W, 2) grid of (x, y) coordinates.

    normalized: x, y in [-1, 1] (W/H endpoints inclusive); otherwise
    pixel indices 0..W-1 / 0..H-1.
    """
    dtype = dtype or torch.float32
    if normalized_coordinates:
        xs = torch.linspace(-1.0, 1.0, width, device=device, dtype=dtype)
        ys = torch.linspace(-1.0, 1.0, height, device=device, dtype=dtype)
    else:
        xs = torch.arange(width, device=device, dtype=dtype)
        ys = torch.arange(height, device=device, dtype=dtype)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], dim=-1)[None]
