"""Evaluation layer (reference L7): metric suites and offline scorers."""

from far_tpu.eval.metrics import (
    relative_pose_error,
    error_auc,
    epidist_prec,
    aggregate_metrics,
    aggregate_metrics_interiornet_streetlearn,
    pose_error,
    a_metrics,
    MetricsAccumulator,
)
from far_tpu.eval import localize  # noqa: F401  (visloc-relapose eval)
