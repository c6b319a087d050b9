#!/usr/bin/env python
"""Isolated A/B of the tiny-window MXU attention branch (VERDICT r5 #6).

far_tpu/models/attention.py:52 dispatches a fold-heads-into-lanes MXU
formulation whenever L,S <= 32 (the fine 5x5 windows). Production fine
attention now runs inside the fused window transformer
(far_tpu/ops/fine_layer.py), so this branch only serves fallback paths
(masked inputs, CPU, non-128 channel counts) — but it is still a
dispatch path, and every dispatch path carries a recorded A/B.

Times three implementations of the identical math at production fine
shapes (n = B*K windows of l = s = 25 tokens, h=8, d=16):
  mxu    — the shipped branch (fold heads, block-diagonal head mask)
  plain  — the generic per-head einsum path (attention.py:82-84)
  quad   — the associativity-equivalent (phiQ phiK^T) V quadratic form

Usage: python scripts/bench_tiny_attention.py [--n 16384] [--iters 20]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16 * 1024,
                    help="windows (B*K at production B=16, K=1024)")
    ap.add_argument("--l", type=int, default=25)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from far_tpu.models.attention import elu_feature_map, linear_attention

    eps = 1e-6

    def plain(q, k, v):
        # the generic path, attention.py:82-84, shape-forced
        Q = elu_feature_map(q)
        K = elu_feature_map(k)
        vl = v.shape[1]
        v = v / vl
        KV = jnp.einsum("nshd,nshv->nhdv", K, v)
        Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
        return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl

    def quad(q, k, v):
        # (phiQ phiK^T) V — smaller intermediate on paper, s=25 minor dim
        Q = elu_feature_map(q)
        K = elu_feature_map(k)
        A = jnp.einsum("nlhd,nshd->nhls", Q, K)
        Z = 1.0 / (jnp.sum(A, axis=-1) + eps)   # (n, h, l)
        out = jnp.einsum("nhls,nshd->nlhd", A, v)
        return out * jnp.transpose(Z, (0, 2, 1))[..., None]

    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (args.n, args.l, args.h, args.d)
    q = jax.random.normal(kq, shape, dt)
    k = jax.random.normal(kk, shape, dt)
    v = jax.random.normal(kv, shape, dt)

    fns = {"mxu": jax.jit(linear_attention), "plain": jax.jit(plain),
           "quad": jax.jit(quad)}
    import numpy as np

    def _sync(r):
        # tunnel-safe fence (see far_tpu/utils/prof.py): fetch real bytes
        return float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                             .astype(jnp.float32)))

    z = jax.device_put(jnp.zeros((8,), jnp.float32))
    _sync(z)
    t0 = time.perf_counter()
    for _ in range(20):
        _sync(z)
    fence_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"# fence {fence_ms:.1f} ms/fetch, subtracted /iters", flush=True)

    ref = np.asarray(fns["plain"](q, k, v), np.float32)
    results = {}
    for name, fn in fns.items():
        out = np.asarray(fn(q, k, v), np.float32)
        err = float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9))
        reps = []
        for _ in range(3):   # 3 repeats of an iters-deep dispatch train
            _sync(fn(q, k, v))  # warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(q, k, v)
            _sync(r)
            reps.append(max((time.perf_counter() - t0) / args.iters * 1e3
                            - fence_ms / args.iters, 0.0))
        med = statistics.median(reps)
        results[name] = med
        print(f"{name:6s}: {med:7.2f} ms  (reps "
              f"{', '.join(f'{t:.2f}' for t in reps)}; "
              f"rel-err vs plain {err:.2e})", flush=True)
    ratio = results["plain"] / results["mxu"]
    print(f"mxu branch speedup vs plain: {ratio:.2f}x at "
          f"n={args.n} l={args.l} h={args.h} d={args.d} {args.dtype}")


if __name__ == "__main__":
    main()
