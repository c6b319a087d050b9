"""pytorch_lightning shim: LightningModule as a plain nn.Module."""

import random

import numpy as np
import torch
import torch.nn as nn

__version__ = "0.0.0-refshim"


class LightningModule(nn.Module):
    def __init__(self):
        super().__init__()
        self.trainer = None

    def save_hyperparameters(self, *args, **kwargs):
        return None

    def log(self, *args, **kwargs):
        return None

    def log_dict(self, *args, **kwargs):
        return None

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")


def seed_everything(seed: int = 0, workers: bool = False) -> int:
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    return seed
