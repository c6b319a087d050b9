"""Distributed communication helpers.

The reference runs NCCL DDP plus a gloo side-channel that gathers
pickled python metric objects across ranks (crockwell/far:
mp3d_loftr/src/utils/comm.py:83-219, with pad-to-max logic because
variable-size tensors can't ride NCCL). The TPU-native equivalent:

- gradients need nothing here — they are psum'd by XLA inside the jitted
  train step (see far_tpu.train.trainer);
- metric aggregation uses fixed-shape arrays + validity masks gathered
  with jax.experimental.multihost_utils (DCN), no object channel.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (the reference's dist.init_process_group
    equivalent). No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def local_mesh(axis_name: str = "data"):
    """1-D mesh over every addressable device (all hosts)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def encode_strings(strings, width: int = 96) -> np.ndarray:
    """Fixed-width utf-8 byte matrix (N, width) so identifier strings can
    ride the same fixed-shape allgather as the metric arrays (the
    reference instead gathers pickled python objects over a gloo
    side-channel, comm.py:83-219)."""
    out = np.zeros((len(strings), width), np.uint8)
    for i, s in enumerate(strings):
        b = s.encode("utf-8")[:width]
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out


def decode_strings(mat: np.ndarray) -> list:
    return [bytes(row[row != 0]).decode("utf-8", "replace") for row in mat]


def all_gather_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather per-host metric arrays to every host, concatenated on axis 0.

    Arrays must have identical shapes across hosts (use the padded
    sequential sampler + identifier dedup, far_tpu.data.sampler).
    Single-process: returns the input unchanged.
    """
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    out = {}
    for k, v in metrics.items():
        g = multihost_utils.process_allgather(np.asarray(v))
        out[k] = np.reshape(g, (-1,) + np.asarray(v).shape[1:])
    return out
