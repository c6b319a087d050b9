#!/usr/bin/env python
"""A/B the fine-window gather on the chip at production shapes.

Variants:
  slice    — gather_windows: one (W, W, C) multi-dim slice-gather per
             window off the padded map (the production path)
  pointwise— gather_windows_pointwise: per-element clamped gather
             (K*W*W fetches of 256 B)

History (B=16, K=1024, 480x640 fine map, both directions, v5e):
  per-(window,dy) wide-row take_along_axis   17.9 ms   (r4 default)
  group-major transposed contiguous slices   19.8 ms   (rejected)
  pointwise                                  12.2 ms
  multi-dim slice gather                      6.8 ms   (r5 default)

Usage: python scripts/bench_fine_gather.py [--b 16] [--k 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/far_tpu_xla_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from far_tpu.models.fine import gather_windows, gather_windows_pointwise

    # production mp3d shapes: fine map 240x320 (stride-2), coarse 60x80
    B, K = args.b, args.k
    hc, wc, stride, W, C = 60, 80, 4, 5, 128
    Hf, Wf = hc * stride, wc * stride
    key = jax.random.PRNGKey(0)
    f0 = jax.random.normal(key, (B, Hf, Wf, C), jnp.bfloat16)
    f1 = jax.random.normal(jax.random.fold_in(key, 1), (B, Hf, Wf, C),
                           jnp.bfloat16)
    ids0 = jax.random.randint(jax.random.fold_in(key, 2), (B, K), 0, hc * wc)
    ids1 = jax.random.randint(jax.random.fold_in(key, 3), (B, K), 0, hc * wc)

    def _sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    z = jax.device_put(jnp.zeros((8,), jnp.float32))
    _sync(z)
    t0 = time.perf_counter()
    for _ in range(20):
        _sync(z)
    fence_ms = (time.perf_counter() - t0) / 20 * 1e3

    def timeit(fn, *a):
        _sync(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*a)
        _sync(r)
        return max((time.perf_counter() - t0) / args.iters * 1e3
                   - fence_ms / args.iters, 0.0)

    base = None
    for name, g in (("slice", gather_windows),
                    ("pointwise", gather_windows_pointwise)):
        fn = jax.jit(lambda a, b, ia, ib, g=g: (
            g(a, ia, (hc, wc), stride, W), g(b, ib, (hc, wc), stride, W)))
        out = fn(f0, f1, ids0, ids1)
        if base is None:
            base = out
        else:
            err = max(float(jnp.max(jnp.abs(
                out[i].astype(jnp.float32) - base[i].astype(jnp.float32))))
                for i in range(2))
            assert err == 0.0, f"{name} mismatch: {err}"
        t = timeit(fn, f0, f1, ids0, ids1)
        print(f"{name:<10} {t:8.2f} ms  (both directions, B={B} K={K})")


if __name__ == "__main__":
    main()
