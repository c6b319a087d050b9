#!/usr/bin/env python
"""Bisect the r4->r5 train-step slowdown: is the multi-dim slice
gather's VJP (scatter-add of (W, W, C) slices) the cost?

Runs bench.train_throughput(B=8) twice in one process: stock HEAD,
then with far_tpu.models.fine.gather_windows monkeypatched to the
pointwise take_along_axis variant (identical function values, different
XLA gather/scatter lowering). Same protocol as bench_train_remat.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.expanduser("~/.cache/far_tpu_xla_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from bench import train_throughput
    import far_tpu.models.fine as fine

    results = {}
    for name in ("slice_gather", "pointwise"):
        if name == "pointwise":
            fine.gather_windows = fine.gather_windows_pointwise
        t0 = time.perf_counter()
        steps_per_sec, B = train_throughput(B=8, iters=5)
        wall = time.perf_counter() - t0
        print(f"{name:<14s}: {steps_per_sec * B:6.1f} pairs/s "
              f"({steps_per_sec:.3f} steps/s; wall {wall:.0f}s)",
              flush=True)
        results[name] = round(steps_per_sec * B, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
