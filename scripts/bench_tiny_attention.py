#!/usr/bin/env python
"""Isolated A/B of the tiny-window linear-attention branch.

models/attention.py dispatches L,S <= 32 sequences to an MXU
formulation (fold heads into the C=h*d lane axis, one batched
(C,s)x(s,C) matmul per window, constant block-diagonal head mask)
instead of the generic per-head einsum path. Round 4 claimed the win
but never recorded an isolated number (VERDICT r4 weak #4 / ask #6).
Production fine shapes: n = B*K = 16*1024 windows, l = s = 25 tokens,
h = 8 heads, d = 16. Note the fused Pallas kernel (ops/fine_layer.py)
owns the production TPU fine path since r5 — this branch now serves
the non-window-dispatch fallbacks — so the A/B decides keep-vs-delete
for the branch, not production perf.

Usage: python scripts/bench_tiny_attention.py [--n 16384] [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/far_tpu_xla_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from far_tpu.models.attention import elu_feature_map

    n, s, h, d = args.n, args.s, 8, 16
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    q = jax.random.normal(jax.random.fold_in(key, 1), (n, s, h, d), dt)
    k = jax.random.normal(jax.random.fold_in(key, 2), (n, s, h, d), dt)
    v = jax.random.normal(jax.random.fold_in(key, 3), (n, s, h, d), dt)
    eps = 1e-6

    def tiny_branch(q, k, v):
        # the L,S <= 32 path of models/attention.py linear_attention
        Q = elu_feature_map(q)
        K = elu_feature_map(k)
        vl = v.shape[1]
        vv = v / vl
        nn_, l, hh, dd = Q.shape
        ss = K.shape[1]
        C = hh * dd
        Qc = Q.reshape(nn_, l, C)
        Kc = K.reshape(nn_, ss, C)
        Vc = vv.reshape(nn_, ss, C)
        eye = jnp.eye(hh, dtype=jnp.float32)
        head_mask = jnp.kron(eye, jnp.ones((dd, dd), jnp.float32)).astype(
            Qc.dtype)
        KV = jnp.einsum("nsc,nsd->ncd", Kc, Vc) * head_mask
        Ksum = jnp.sum(K, axis=1)
        Z = 1.0 / (jnp.sum(Q * Ksum[:, None], axis=-1) + eps)
        out = jnp.einsum("nlc,ncd->nld", Qc, KV).reshape(nn_, l, hh, dd)
        return out * Z[..., None] * vl

    def generic_path(q, k, v):
        # the generic per-head einsum path (attention.py:82-85)
        Q = elu_feature_map(q)
        K = elu_feature_map(k)
        vl = v.shape[1]
        vv = v / vl
        KV = jnp.einsum("nshd,nshv->nhdv", K, vv)
        Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
        return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl

    tiny = jax.jit(tiny_branch)
    gen = jax.jit(generic_path)

    o_t = np.asarray(tiny(q, k, v), np.float32)
    o_g = np.asarray(gen(q, k, v), np.float32)
    err = float(np.max(np.abs(o_t - o_g)))
    scale = float(np.max(np.abs(o_g)))
    print(f"# max abs err tiny vs generic: {err:.5f} (scale {scale:.2f})")

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

    t_g = timeit(gen, q, k, v)
    t_t = timeit(tiny, q, k, v)
    print(f"n={n} s={s} h={h} d={d} bf16 (one attention application)")
    print(f"generic per-head einsum path : {t_g:8.2f} ms")
    print(f"tiny-window MXU branch       : {t_t:8.2f} ms   "
          f"({t_g / max(t_t, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
