"""Structured metric logging.

Replaces the reference's TensorBoard SummaryWriter + loguru rank-zero
muting (crockwell/far: mp3d_loftr/src/utils/misc.py:31-40,
interiornetStreetlearn_8ptVit/src/logger.py): JSONL scalars always;
TensorBoard when the package is importable; everything silent off
process 0.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, logdir, name: str = "train", rank: int = 0,
                 print_every: int = 100):
        self.rank = rank
        self.print_every = print_every
        self._running = defaultdict(list)
        self._tb = None
        self._fh = None
        if rank != 0:
            return
        logdir = Path(logdir)
        logdir.mkdir(parents=True, exist_ok=True)
        self._fh = open(logdir / f"{name}_metrics.jsonl", "a")
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self._tb = SummaryWriter(str(logdir / "tb"))
        except Exception:
            self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "") -> None:
        if self.rank != 0:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            v = float(np.asarray(v))
            key = f"{prefix}{k}"
            rec[key] = v
            self._running[key].append(v)
            if self._tb is not None:
                self._tb.add_scalar(key, v, step)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.print_every and step % self.print_every == 0:
            means = {k: float(np.mean(v[-self.print_every:]))
                     for k, v in self._running.items()}
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
            print(f"[step {step}] {msg}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()
