"""Training layer: supervision, losses, optimizers, pjit trainer."""

from far_tpu.train.losses import FarLosses, compute_losses
from far_tpu.train.supervision import coarse_supervision, fine_supervision
from far_tpu.train.optim import build_optimizer
from far_tpu.train.trainer import TrainState, Trainer, make_train_step
