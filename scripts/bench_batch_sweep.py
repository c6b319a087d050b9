#!/usr/bin/env python
"""Eval batch-size sweep: e2e FAR inference pairs/s/chip vs B.

The bench batch size was pinned at B=16 in round 1 without a recorded
sweep (VERDICT r4 #3). Static shapes make larger batches free to try,
and inference HBM is far below the training footprint; the torch
reference is structurally stuck at bs=1/GPU (mp3d_loftr/test.py:34).
Same measurement protocol as bench.py main(): on-device PRNG inputs,
single fetch per repeat, median of `--repeats`.

Usage: python scripts/bench_batch_sweep.py [--batches 16,32,64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(B: int, iters: int, repeats: int):
    import jax
    import jax.numpy as jnp

    from far_tpu.pipeline import far_forward, init_model
    from far_tpu.types import PairBatch
    from far_tpu.utils.config import FARConfig

    cfg = FARConfig(dtype="bfloat16")
    model, variables = init_model(cfg, seed=0, batch_size=B)
    H, W = cfg.image_size
    K = np.array([[517.97, 0, 320.0], [0, 517.97, 240.0], [0, 0, 1]],
                 np.float32)
    K_dev = jnp.tile(jnp.asarray(K)[None], (B, 1, 1))

    @jax.jit
    def step(variables, key):
        k0, k1, ks = jax.random.split(key, 3)
        batch = PairBatch(
            image0=jax.random.uniform(k0, (B, H, W, 1), jnp.float32),
            image1=jax.random.uniform(k1, (B, H, W, 1), jnp.float32),
            K0=K_dev, K1=K_dev,
        )
        out = far_forward(model, variables, batch, ks, train=False)
        return jnp.sum(out.R) + jnp.sum(out.t)

    base = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    float(step(variables, base))
    compile_s = time.perf_counter() - t0

    rates = []
    for rep in range(repeats):
        keys = [jax.random.fold_in(base, rep * iters + i)
                for i in range(iters)]
        jax.block_until_ready(keys)
        t0 = time.perf_counter()
        vals = [step(variables, keys[i]) for i in range(iters)]
        acc = float(jnp.stack(vals).sum())
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        rates.append(B * iters / dt)
    med = float(np.median(rates))
    spread = (max(rates) - min(rates)) / med * 100.0 if med else 0.0
    return med, spread, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache = os.path.expanduser("~/.cache/far_tpu_xla_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    results = {}
    for B in (int(b) for b in args.batches.split(",")):
        iters = max(8, (args.iters * 16) // B)  # ~equal pairs per repeat
        try:
            med, spread, compile_s = measure(B, iters, args.repeats)
        except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
            msg = str(e).splitlines()[0][:160]
            print(f"B={B:3d}: FAILED ({msg})", flush=True)
            results[B] = {"error": msg}
            continue
        print(f"B={B:3d}: {med:7.1f} pairs/s (+-{spread:.2f}%, "
              f"iters={iters} x{args.repeats}, compile {compile_s:.0f}s)",
              flush=True)
        results[B] = {"pairs_per_sec": round(med, 1),
                      "spread_pct": round(spread, 2)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
