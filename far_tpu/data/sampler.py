"""Index samplers.

Equivalent of crockwell/far: mapfree_6dreg/lib/datasets/sampler.py
(RandomConcatSampler — scene-balanced sampling with replacement, shuffle,
repeat, and per-rank slicing for data parallelism) and the reference's
'scene_balance' / 'random' TRAINER.DATA_SAMPLER options, as pure index
generators (no torch).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def scene_balance_indices(
    scene_lengths: Sequence[int],
    n_samples_per_scene: int,
    seed: int,
    replacement: bool = True,
    shuffle: bool = True,
    repeat: int = 1,
    rank: int = 0,
    world_size: int = 1,
) -> np.ndarray:
    """Balanced sampling: n per scene (with/without replacement), global
    shuffle, optional repetition, sliced for this rank."""
    rng = np.random.default_rng(seed)
    offsets = np.cumsum([0] + list(scene_lengths))
    chunks = []
    for s, length in enumerate(scene_lengths):
        if length == 0:
            continue
        if replacement:
            idx = rng.integers(0, length, size=n_samples_per_scene)
        else:
            k = min(n_samples_per_scene, length)
            idx = rng.permutation(length)[:k]
        chunks.append(idx + offsets[s])
    out = np.concatenate(chunks) if chunks else np.zeros(0, np.int64)
    if shuffle:
        out = rng.permutation(out)
    if repeat > 1:
        reps = [out]
        for _ in range(repeat - 1):
            reps.append(rng.permutation(out) if shuffle else out)
        out = np.concatenate(reps)
    # rank slice (reference sampler.py:92-97): contiguous split per rank
    per_rank = len(out) // world_size
    return out[rank * per_rank:(rank + 1) * per_rank]


def random_indices(
    n: int,
    num_samples: Optional[int] = None,
    seed: int = 0,
    replacement: bool = True,
    rank: int = 0,
    world_size: int = 1,
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    m = num_samples or n
    idx = rng.integers(0, n, size=m) if replacement else rng.permutation(n)[:m]
    per_rank = len(idx) // world_size
    return idx[rank * per_rank:(rank + 1) * per_rank]


def sequential_indices(n: int, rank: int = 0, world_size: int = 1,
                       pad: bool = True) -> np.ndarray:
    """Eval sharding: contiguous per-rank slices; optionally pads the tail
    by repeating the last items (metric aggregation dedups by identifier,
    the same trick the reference relies on)."""
    idx = np.arange(n)
    if pad and n % world_size:
        idx = np.concatenate([idx, idx[: world_size - n % world_size]])
    return idx[rank::world_size]
