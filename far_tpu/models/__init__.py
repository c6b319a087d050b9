"""Flax model zoo: LoFTR matcher + FAR regressor family."""

from far_tpu.models.loftr import FARLoFTR
from far_tpu.models.constants import POSE_MEAN_6D, POSE_STD_6D
