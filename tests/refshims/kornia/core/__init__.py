"""kornia.core shim: the aliases prior_ransac/ransac.py:14 imports."""

from typing import Any

import torch

Tensor = torch.Tensor
Module = torch.nn.Module
Device = Any


def zeros(*args, **kwargs):
    return torch.zeros(*args, **kwargs)


from kornia.core import check  # noqa: E402,F401
