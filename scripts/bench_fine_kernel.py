#!/usr/bin/env python
"""A/B the fused fine-window transformer kernel vs the unfused path.

Production fine shapes: n = B*K windows of s=25 tokens, C=128, H=8,
bf16. Prints ms per full fine-transformer invocation (2 layers x both
directions) for each path, plus a numerics check.

Usage: python scripts/bench_fine_kernel.py [--n 16384] [--wg 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16 * 1024)
    ap.add_argument("--s", type=int, default=25)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/far_tpu_xla_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import far_tpu.ops.fine_layer as fl
    from far_tpu.ops.fine_layer import _fused, fine_transformer_reference

    C, H = 128, 8
    n, s = args.n, args.s
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    f0 = jax.random.normal(jax.random.fold_in(key, 1), (n, s, C), dt)
    f1 = jax.random.normal(jax.random.fold_in(key, 2), (n, s, C), dt)
    params = []
    for i in range(2):
        ks = jax.random.split(jax.random.fold_in(key, 10 + i), 7)
        params.append({
            "wq": jax.random.normal(ks[0], (C, C)) * 0.05,
            "wk": jax.random.normal(ks[1], (C, C)) * 0.05,
            "wv": jax.random.normal(ks[2], (C, C)) * 0.05,
            "wm": jax.random.normal(ks[3], (C, C)) * 0.05,
            "w0x": jax.random.normal(ks[4], (C, 2 * C)) * 0.05,
            "w0m": jax.random.normal(ks[5], (C, 2 * C)) * 0.05,
            "w1": jax.random.normal(ks[6], (2 * C, C)) * 0.05,
            "ln1": jnp.stack([jnp.ones(C), jnp.zeros(C)]),
            "ln2": jnp.stack([jnp.ones(C), jnp.zeros(C)]),
        })
    names = ("self", "cross")

    fused = jax.jit(lambda a, b, p: _fused(a, b, p, names, H))
    ref = jax.jit(lambda a, b, p: fine_transformer_reference(
        a, b, p, names, H))

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

    o_f = fused(f0, f1, params)
    o_r = ref(f0, f1, params)
    err = max(
        float(jnp.max(jnp.abs(o_f[0].astype(jnp.float32)
                              - o_r[0].astype(jnp.float32)))),
        float(jnp.max(jnp.abs(o_f[1].astype(jnp.float32)
                              - o_r[1].astype(jnp.float32)))))
    scale = float(jnp.max(jnp.abs(o_r[0].astype(jnp.float32))))
    print(f"# max abs err fused vs ref: {err:.4f} (scale {scale:.2f})")

    t_ref = timeit(ref, f0, f1, params)
    t_fused = timeit(fused, f0, f1, params)
    print(f"wg={fl._WG} wa={fl._WA} n={n} s={s}")
    print(f"unfused reference : {t_ref:8.2f} ms")
    print(f"fused kernel      : {t_fused:8.2f} ms   "
          f"({t_ref / max(t_fused, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
