#!/usr/bin/env python
"""Train-step throughput A/B: batch size x backbone remat policy.

Round-4 found full remat (whole-FPN recompute) lets B=16 fit one v5e
chip but halves throughput (9.3 vs 17.4 pairs/s), so B=8 no-remat
stayed the config of record. remat='selective' (keep conv outputs,
recompute only the elementwise norm/relu between them —
far_tpu/models/backbone.py) should cut most of the activation memory
for a few %% extra HBM traffic. This records the sweep that decides
the train config of record (VERDICT r4 #4).

Usage: python scripts/bench_train_remat.py \
          [--configs 8:none,16:selective,16:full,24:selective]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8:none,16:selective,24:selective")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    cache = os.path.expanduser("~/.cache/far_tpu_xla_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from bench import train_throughput

    results = {}
    for spec in args.configs.split(","):
        b_s, r_s = spec.split(":")
        B = int(b_s)
        remat = {"none": False, "full": True}.get(r_s, r_s)
        t0 = time.perf_counter()
        try:
            steps_per_sec, _ = train_throughput(B=B, iters=args.iters,
                                                remat=remat)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"B={B:3d} remat={r_s:<9s}: FAILED ({msg})", flush=True)
            results[spec] = {"error": msg}
            continue
        wall = time.perf_counter() - t0
        pairs = steps_per_sec * B
        print(f"B={B:3d} remat={r_s:<9s}: {pairs:6.1f} pairs/s "
              f"({steps_per_sec:.3f} steps/s; incl-compile wall "
              f"{wall:.0f}s)", flush=True)
        results[spec] = {"train_pairs_per_sec": round(pairs, 1),
                         "steps_per_sec": round(steps_per_sec, 3)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
