"""Tracing / profiling helpers.

Equivalent of crockwell/far: mp3d_loftr/src/utils/profiler.py — the
reference wraps PL's SimpleProfiler with cuda.synchronize around named
regions; here regions are jax.profiler traces + block_until_ready timing,
and named scopes annotate the XLA profile.

Timing protocol on a TUNNELED dev TPU (the axon backend), learned the
hard way during rounds 2-3:

- ``block_until_ready`` returns before remote execution completes on
  the tunnel, so it is NOT a fence. The only reliable fence is fetching
  real bytes: reduce the last output to a scalar and ``float()`` it —
  executions on the stream are ordered, so the fetch implies all prior
  work finished. ``bench.py::_make_timer`` implements this, calibrates
  the fence's own tunnel round-trip (~1-30 ms) on a precomputed scalar,
  and subtracts it so fast stages aren't biased upward.
- The tunnel proxies XLA compilation over HTTP with a body-size cap:
  any large array captured by a jitted closure is embedded in the
  serialized program and trips HTTP 413. Jitted functions must take
  ALL device arrays as call-time arguments; close over Python
  scalars/shapes only.
- Remote compiles take minutes; set ``jax_compilation_cache_dir`` (see
  ``bench.py::_enable_compile_cache``) so repeat runs skip them.
- The backend flaps (multi-hour UNAVAILABLE windows observed); claim
  devices with bounded retry (``bench.py::_claim_backend_with_retry``)
  and keep measurement sessions idempotent/resumable.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class InferenceProfiler:
    """Accumulates wall time per named region with device sync.

    Usage:
        prof = InferenceProfiler()
        with prof.profile("LoFTR"):
            out = jax.block_until_ready(fn(...))
        print(prof.summary())
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def profile(self, name: str):
        with jax.named_scope(name):
            t0 = time.perf_counter()
            yield
            if self.sync:
                # ensure everything dispatched in the region finished
                jax.effects_barrier()
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = ["region                         total_s   calls   mean_ms"]
        for k in sorted(self.times, key=self.times.get, reverse=True):
            t, c = self.times[k], self.counts[k]
            rows.append(f"{k:<30} {t:8.3f} {c:7d} {t / c * 1e3:9.2f}")
        return "\n".join(rows)


class PassThroughProfiler:
    @contextlib.contextmanager
    def profile(self, name: str):
        yield

    def summary(self) -> str:
        return "(profiling disabled)"


def build_profiler(name: Optional[str] = None):
    """Mirror of the reference's build_profiler flag values."""
    if name == "inference":
        return InferenceProfiler()
    if name == "xla":
        return XLATraceProfiler()
    return PassThroughProfiler()


class XLATraceProfiler(PassThroughProfiler):
    """Writes an XLA trace viewable in TensorBoard / Perfetto."""

    def __init__(self, logdir: str = "/tmp/far_tpu_trace"):
        self.logdir = logdir

    @contextlib.contextmanager
    def trace(self):
        jax.profiler.start_trace(self.logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
