"""Batching and prefetch.

Replaces the reference's torch DataLoader + DistributedSampler plumbing
(crockwell/far: mp3d_loftr/src/lightning/data.py) with a small
thread-prefetching loader that collates numpy sample dicts into the
statically-shaped PairBatch pytree. Host->device transfer overlaps with
compute via a one-deep prefetch queue (the reference's num_workers
pipelining, minus the process forking).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from far_tpu.types import PairBatch

_OPTIONAL = ("T_0to1", "T_1to0", "depth0", "depth1", "scale0", "scale1")


def collate_pairs(samples: List[Dict]) -> PairBatch:
    """Stack sample dicts into a PairBatch (optional fields only if
    present in every sample)."""
    def stack(key):
        return np.stack([np.asarray(s[key], np.float32) for s in samples])

    kwargs = dict(
        image0=stack("image0"),
        image1=stack("image1"),
        K0=stack("K0"),
        K1=stack("K1"),
        pair_id=np.stack([np.asarray(s["pair_id"]) for s in samples]),
    )
    for key in _OPTIONAL:
        if all(key in s for s in samples):
            kwargs[key] = stack(key)
    return PairBatch(**kwargs)


class Loader:
    """Iterate a dataset by index list with background prefetch.

    Args:
        dataset: sequence-like with __getitem__ -> sample dict.
        indices: iteration order (from far_tpu.data.sampler).
        batch_size: pairs per batch; tail is dropped (static shapes).
        prefetch: number of batches prepared ahead on worker threads.
    """

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 prefetch: int = 2, collate=collate_pairs,
                 keep_meta: bool = False, workers: int = 1):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.prefetch = max(1, prefetch)
        self.collate = collate
        self.keep_meta = keep_meta
        # workers > 1: batch b is produced by thread b % workers; the
        # consumer reads the per-worker queues round-robin, so batch
        # order is deterministic regardless of thread scheduling. PIL's
        # JPEG decoder and the native resize both release the GIL, so
        # decode threads scale (one thread caps at ~decode-bound rate;
        # see bench.py --host_io).
        self.workers = max(1, workers)

    def __len__(self):
        return len(self.indices) // self.batch_size

    def _make_batch(self, b: int):
        idx = self.indices[b * self.batch_size:(b + 1) * self.batch_size]
        samples = [self.dataset[int(i)] for i in idx]
        batch = self.collate(samples)
        if self.keep_meta:
            meta = {
                "pair_names": [s.get("pair_names") for s in samples],
                "scene": [s.get("scene") for s in samples],
            }
            return batch, meta
        return batch

    def _produce(self, q: queue.Queue, worker: int):
        try:
            for b in range(worker, len(self), self.workers):
                q.put(self._make_batch(b))
            q.put(None)
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)

    def __iter__(self) -> Iterator:
        queues = [queue.Queue(maxsize=self.prefetch)
                  for _ in range(self.workers)]
        for w, q in enumerate(queues):
            threading.Thread(target=self._produce, args=(q, w),
                             daemon=True).start()
        for b in range(len(self)):
            item = queues[b % self.workers].get()
            if isinstance(item, BaseException):
                raise item
            assert item is not None
            yield item
