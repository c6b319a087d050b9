# scratch: fine-stage timing A/B (delete before commit)
import functools
import sys
import time

import jax
import jax.numpy as jnp

from far_tpu.models.fine import FineMatching, FinePreprocess
from far_tpu.utils.config import FARConfig

log = lambda *a: (print(*a), sys.stdout.flush())

cfg = FARConfig(dtype="bfloat16")
B = 16
K = cfg.match.max_matches
hc, wc = cfg.coarse_hw
Hf = cfg.image_size[0] // cfg.backbone.resolution[1]
Wf = cfg.image_size[1] // cfg.backbone.resolution[1]
Cf = cfg.fine.d_model
Cc = cfg.coarse.d_model
stride = cfg.backbone.resolution[0] // cfg.backbone.resolution[1]
log(f"B={B} K={K} fine={Hf}x{Wf}x{Cf} stride={stride} W={cfg.fine.window_size}")

key = jax.random.PRNGKey(0)
dt = jnp.bfloat16
mk_img = lambda i: jax.random.normal(jax.random.fold_in(key, 100 + i),
                                     (B, Hf, Wf, Cf), dt)
feat_f1 = jax.random.normal(jax.random.fold_in(key, 1), (B, Hf, Wf, Cf), dt)
feat_c0 = jax.random.normal(jax.random.fold_in(key, 2), (B, hc * wc, Cc), dt)
feat_c1 = jax.random.normal(jax.random.fold_in(key, 3), (B, hc * wc, Cc), dt)
i_ids = jax.random.randint(jax.random.fold_in(key, 4), (B, K), 0, hc * wc)
j_ids = jax.random.randint(jax.random.fold_in(key, 5), (B, K), 0, hc * wc)

pre = FinePreprocess(cfg.fine, d_model_c=Cc, dtype=dt)
match = FineMatching(cfg.fine, dtype=dt)

imgs = [mk_img(i) for i in range(4)]
t0 = time.perf_counter()
pvars = jax.jit(functools.partial(
    pre.init, coarse_hw=(hc, wc), stride=stride))(
    key, imgs[0], feat_f1, feat_c0, feat_c1, i_ids, j_ids)
log(f"pre.init jit: {time.perf_counter() - t0:.1f}s")

pre_fn = jax.jit(lambda f: pre.apply(
    pvars, f, feat_f1, feat_c0, feat_c1, i_ids, j_ids, (hc, wc), stride))
t0 = time.perf_counter()
f0, f1 = jax.block_until_ready(pre_fn(imgs[0]))
log(f"pre_fn compile: {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
mvars = jax.jit(match.init)(key, f0, f1)
match_fn = jax.jit(lambda a, b: match.apply(mvars, a, b))
wins = [jax.block_until_ready(pre_fn(im)) for im in imgs[:2]]
jax.block_until_ready(match_fn(*wins[0]))
log(f"match init+compile: {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
full_fn = jax.jit(lambda f: match.apply(mvars, *pre.apply(
    pvars, f, feat_f1, feat_c0, feat_c1, i_ids, j_ids, (hc, wc), stride)))
jax.block_until_ready(full_fn(imgs[0]))
log(f"full compile: {time.perf_counter() - t0:.1f}s")


def run(tag, fn, inputs, iters=20):
    jax.block_until_ready(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*inputs[i % len(inputs)]))
    jax.block_until_ready(outs[-1])
    log(f"{tag:30s} {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms")


run("fine gather+merge", pre_fn, [(im,) for im in imgs])
run("fine transformer+softargmax", match_fn, wins)
run("fine full stage", full_fn, [(im,) for im in imgs])
