#!/usr/bin/env python
"""Throughput benchmark: FAR end-to-end image pairs/sec on one TPU chip.

Runs the full FAR inference loop (matcher -> RANSAC -> regressor ->
prior-RANSAC -> regressor) at the production 480x640 resolution with
mp3d intrinsics, and prints ONE JSON line.

Measurement protocol: inputs are generated on-device (distinct per
iteration via PRNG fold-in) and a dependency-carrying checksum is
fetched once after the timed loop. This measures chip throughput —
the dev harness reaches the TPU through a ~30 ms / ~50 MB/s tunnel that
would otherwise dominate (a production host feeds the chip over local
DMA). Each iteration's inputs differ, so nothing can be cached.

Baseline: the driver north-star is >=500 pairs/sec on a v5e-8, i.e.
62.5 pairs/sec/chip (the torch reference runs 1 pair/GPU with CPU-bound
cv2 solver hops; see BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from far_tpu.pipeline import far_forward, init_model
    from far_tpu.types import PairBatch
    from far_tpu.utils.config import FARConfig

    B = 16  # pairs per device batch
    cfg = FARConfig(dtype="bfloat16")
    model, variables = init_model(cfg, seed=0, batch_size=B)

    H, W = cfg.image_size
    K = np.array([[517.97, 0, 320.0], [0, 517.97, 240.0], [0, 0, 1]],
                 np.float32)
    K_dev = jnp.tile(jnp.asarray(K)[None], (B, 1, 1))

    @jax.jit
    def step(variables, key):
        k_img0, k_img1, k_solver = jax.random.split(key, 3)
        batch = PairBatch(
            image0=jax.random.uniform(k_img0, (B, H, W, 1), jnp.float32),
            image1=jax.random.uniform(k_img1, (B, H, W, 1), jnp.float32),
            K0=K_dev,
            K1=K_dev,
        )
        out = far_forward(model, variables, batch, k_solver, train=False)
        # checksum depends on every pair's final pose
        return jnp.sum(out.R) + jnp.sum(out.t)

    # warmup / compile
    base = jax.random.PRNGKey(0)
    float(step(variables, base))

    iters = 30
    keys = [jax.random.fold_in(base, i) for i in range(iters)]
    jax.block_until_ready(keys)

    t0 = time.perf_counter()
    acc = 0.0
    vals = [step(variables, keys[i]) for i in range(iters)]
    acc = float(jnp.stack(vals).sum())  # single host sync at the end
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    pairs_per_sec = B * iters / dt

    baseline = 62.5  # pairs/sec/chip implied by the 500 pairs/s v5e-8 target
    print(json.dumps({
        "metric": "far_e2e_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "image pairs/sec/chip (480x640, full FAR loop, B=16)",
        "vs_baseline": round(pairs_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
