# scratch: one-process TPU measurement session (delete before commit)
# Runs everything sequentially in a single claim: fine-stage timing,
# e2e bench, train throughput.
#
# IMPORTANT (this host): the axon tunnel proxies XLA compilation over
# HTTP with a body-size cap — any large array captured by a jitted
# closure is embedded into the serialized program and trips HTTP 413.
# Every jitted function below therefore takes ALL device arrays as
# call-time arguments; only Python scalars/shapes are closed over.
import sys
import time

t0 = time.time()
log = lambda *a: (print(f"[{time.time() - t0:7.1f}s]", *a), sys.stdout.flush())

log("claiming TPU (may block while the pool lease is wedged)...")
import jax

log("devices:", jax.devices())

import functools

import jax.numpy as jnp
import numpy as np

# ---------------- fine-stage timing ----------------------------------
from far_tpu.models.fine import FineMatching, FinePreprocess
from far_tpu.utils.config import FARConfig

cfg = FARConfig(dtype="bfloat16")
B = 16
K = cfg.match.max_matches
hc, wc = cfg.coarse_hw
Hf = cfg.image_size[0] // cfg.backbone.resolution[1]
Wf = cfg.image_size[1] // cfg.backbone.resolution[1]
Cf = cfg.fine.d_model
Cc = cfg.coarse.d_model
stride = cfg.backbone.resolution[0] // cfg.backbone.resolution[1]
log(f"fine shapes: B={B} K={K} {Hf}x{Wf}x{Cf} stride={stride}")

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
pvars = jax.jit(functools.partial(
    pre.init, coarse_hw=(hc, wc), stride=stride))(
    key, imgs[0], feat_f1, feat_c0, feat_c1, i_ids, j_ids)
log("pre.init done")


def _pre(pv, f, f1, c0, c1, ii, jj):
    return pre.apply(pv, f, f1, c0, c1, ii, jj, (hc, wc), stride)


pre_fn = jax.jit(_pre)
PRE_ARGS = (pvars, feat_f1, feat_c0, feat_c1, i_ids, j_ids)
f0w, f1w = jax.block_until_ready(
    pre_fn(pvars, imgs[0], feat_f1, feat_c0, feat_c1, i_ids, j_ids))
log("pre_fn compiled")
mvars = jax.jit(match.init)(key, f0w, f1w)
match_fn = jax.jit(lambda mv, a, b: match.apply(mv, a, b))
wins = [jax.block_until_ready(
    pre_fn(pvars, im, feat_f1, feat_c0, feat_c1, i_ids, j_ids))
    for im in imgs[:2]]
jax.block_until_ready(match_fn(mvars, *wins[0]))
log("match_fn compiled")


def _full(pv, mv, f, f1, c0, c1, ii, jj):
    return match.apply(mv, *pre.apply(pv, f, f1, c0, c1, ii, jj,
                                      (hc, wc), stride))


full_fn = jax.jit(_full)
jax.block_until_ready(
    full_fn(pvars, mvars, imgs[0], feat_f1, feat_c0, feat_c1, i_ids, j_ids))
log("full_fn compiled")


def run(tag, fn, inputs, iters=20):
    jax.block_until_ready(fn(*inputs[0]))
    t = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*inputs[i % len(inputs)]))
    jax.block_until_ready(outs[-1])
    log(f"{tag:30s} {(time.perf_counter() - t) / iters * 1e3:7.2f} ms")


run("fine gather+merge", pre_fn,
    [(pvars, im) + PRE_ARGS[1:] for im in imgs])
run("fine transformer+softargmax", match_fn,
    [(mvars,) + w for w in wins])
run("fine full stage", full_fn,
    [(pvars, mvars, im) + PRE_ARGS[1:] for im in imgs])

# micro-splits: locate the gather/merge and attention/glue boundaries
from far_tpu.models.attention import linear_attention
from far_tpu.models.fine import gather_windows


def sect(name, thunk):
    """Run one experimental section; a Mosaic/compile failure logs and
    moves on instead of killing the whole claim."""
    try:
        thunk()
    except Exception as e:
        log(name, "SECTION FAILED:", type(e).__name__, str(e)[:300])


W = cfg.fine.window_size


def _gather_only():
    f = jax.jit(lambda ff, ii: gather_windows(ff, ii, (hc, wc), stride, W))
    jax.block_until_ready(f(imgs[0], i_ids))
    run("gather only (1 side)", f, [(im, i_ids) for im in imgs])


sect("gather only", _gather_only)

# fine transformer with batched self layers (same params; flag only)
from far_tpu.models.transformer import LocalFeatureTransformer

lft_vars = {"params": mvars["params"]["loftr_fine"]}
WWf = cfg.fine.window_size ** 2


def _lft_ab():
    for tag, flag in [("batched-self", True), ("sequential", False)]:
        lft = LocalFeatureTransformer(
            d_model=cfg.fine.d_model, nhead=cfg.fine.nhead,
            layer_names=tuple(cfg.fine.layer_names),
            attention=cfg.fine.attention, dtype=dt, batch_self=flag)

        def fn(lv, a, b, _l=lft):
            return _l.apply(lv, a.reshape(-1, WWf, Cf),
                            b.reshape(-1, WWf, Cf))

        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(lft_vars, *wins[0]))
        run(f"fine transformer {tag}", jfn,
            [(lft_vars,) + w for w in wins])


sect("fine lft A/B", _lft_ab)


def _coarse_ab():
    # coarse stack batched-self A/B (fused Pallas path, L=4800)
    lftc_s = LocalFeatureTransformer(
        d_model=Cc, nhead=cfg.coarse.nhead,
        layer_names=tuple(cfg.coarse.layer_names),
        attention=cfg.coarse.attention, dtype=dt, batch_self=False)
    lftc_b = LocalFeatureTransformer(
        d_model=Cc, nhead=cfg.coarse.nhead,
        layer_names=tuple(cfg.coarse.layer_names),
        attention=cfg.coarse.attention, dtype=dt, batch_self=True)
    cvars = jax.jit(lftc_s.init)(key, feat_c0, feat_c1)
    cs_fn = jax.jit(lambda cv, a, b: lftc_s.apply(cv, a, b))
    cb_fn = jax.jit(lambda cv, a, b: lftc_b.apply(cv, a, b))
    jax.block_until_ready(cs_fn(cvars, feat_c0, feat_c1))
    jax.block_until_ready(cb_fn(cvars, feat_c0, feat_c1))
    cpairs = [(cvars, feat_c0, feat_c1), (cvars, feat_c1, feat_c0)]
    run("coarse stack sequential", cs_fn, cpairs)
    run("coarse stack batched-self", cb_fn, cpairs)


sect("coarse A/B", _coarse_ab)


def gather_windows_dense(feat_f, ids, coarse_hw, stride, window):
    # pre-dfdd626 variant: materialize ALL windows (s2d slices, 25x
    # stack write) then one big-row gather; A/B vs the sparse
    # per-offset gather now in the library
    Bq, Hf_, Wf_, C_ = feat_f.shape
    hc_, wc_ = coarse_hw
    r_ = window // 2
    WW_ = window * window
    fpad = jnp.pad(feat_f, ((0, 0), (r_, r_), (r_, r_), (0, 0)))
    Hp, Wp = Hf_ + 2 * r_, Wf_ + 2 * r_
    ph, pw = (-Hp) % stride, (-Wp) % stride
    if ph or pw:
        fpad = jnp.pad(fpad, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = Hp + ph, Wp + pw
    f2 = fpad.reshape(Bq, Hp // stride, stride, Wp // stride, stride,
                      C_).transpose(0, 1, 3, 2, 4, 5)
    slices = [
        f2[:, dy // stride: dy // stride + hc_,
           dx // stride: dx // stride + wc_, dy % stride, dx % stride, :]
        for dy in range(window) for dx in range(window)
    ]
    allw = jnp.stack(slices, axis=3)
    flat = allw.reshape(Bq, hc_ * wc_, WW_ * C_)
    out = jnp.take_along_axis(flat, ids[..., None], axis=1)
    return out.reshape(Bq, ids.shape[1], WW_, C_)


def _dense_gather():
    fn = jax.jit(
        lambda ff, ii: gather_windows_dense(ff, ii, (hc, wc), stride, W))
    jax.block_until_ready(fn(imgs[0], i_ids))
    run("gather dense-allwindows (1 side)", fn, [(im, i_ids) for im in imgs])


sect("dense gather", _dense_gather)


def _vmem_gather():
    from far_tpu.ops.window_gather import gather_windows_vmem

    fn = jax.jit(
        lambda ff, ii: gather_windows_vmem(ff, ii, (hc, wc), stride, W))
    jax.block_until_ready(fn(imgs[0], i_ids))
    run("gather vmem-pallas (1 side)", fn, [(im, i_ids) for im in imgs])


sect("vmem gather", _vmem_gather)


def _candidate_full():
    # candidate production fine stage: vmem gather + batched self
    import dataclasses as _dc

    cfg_c = _dc.replace(cfg, fine=_dc.replace(
        cfg.fine, gather="vmem", batch_self=True, split_merge=True))
    pre_c = FinePreprocess(cfg_c.fine, d_model_c=Cc, dtype=dt)
    match_c = FineMatching(cfg_c.fine, dtype=dt)

    def fn(pv, mv, f, f1, c0, c1, ii, jj):
        return match_c.apply(mv, *pre_c.apply(
            pv, f, f1, c0, c1, ii, jj, (hc, wc), stride))

    jfn = jax.jit(fn)
    jax.block_until_ready(
        jfn(pvars, mvars, imgs[0], feat_f1, feat_c0, feat_c1, i_ids, j_ids))
    run("fine full stage (vmem+batch)", jfn,
        [(pvars, mvars, im) + PRE_ARGS[1:] for im in imgs])


sect("candidate full fine", _candidate_full)


def _tiny_attention():
    h = cfg.fine.nhead
    d = Cf // h
    WW = W * W
    qkv = [jax.random.normal(jax.random.fold_in(key, 300 + i),
                             (B * K, WW, h, d), dt) for i in range(6)]
    fn = jax.jit(lambda q, k, v: (linear_attention(q, k, v),
                                  linear_attention(k, q, v),
                                  linear_attention(v, q, k),
                                  linear_attention(q, v, k)))
    jax.block_until_ready(fn(*qkv[:3]))
    run("tiny-window attention (4x)", fn,
        [tuple(qkv[:3]), tuple(qkv[3:])])


sect("tiny attention", _tiny_attention)

# free the fine-stage buffers before the e2e bench claims HBM
del imgs, wins, feat_f1, feat_c0, feat_c1, f0w, f1w, PRE_ARGS

# ---------------- e2e bench ------------------------------------------
log("e2e bench...")
import bench

sys.argv = ["bench.py"]
bench.main()
log("bench done")

# ---------------- train throughput: B=16 with remat ------------------
log("train B=16 remat...")
import dataclasses

from far_tpu.train.optim import OptimConfig
from far_tpu.train.trainer import Trainer
from far_tpu.types import PairBatch

for tag, tb, rm in [("B16_remat", 16, True), ("B8_remat", 8, True)]:
    try:
        tcfg = FARConfig(dtype="bfloat16", remat=rm)
        trainer = Trainer(tcfg, OptimConfig(lr=1e-4, warmup_steps=0,
                                            scheduler="none"))
        state = trainer.init(seed=0, batch_size=tb)
        H, W2 = tcfg.image_size
        Km = jnp.tile(jnp.asarray(np.array(
            [[517.97, 0, 320.0], [0, 517.97, 240.0], [0, 0, 1]],
            np.float32))[None], (tb, 1, 1))
        T = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (tb, 1, 1))

        def mk_batch(k):
            k0, k1 = jax.random.split(k)
            return PairBatch(
                image0=jax.random.uniform(k0, (tb, H, W2, 1), jnp.float32),
                image1=jax.random.uniform(k1, (tb, H, W2, 1), jnp.float32),
                K0=Km, K1=Km, T_0to1=T, T_1to0=T,
                depth0=jnp.full((tb, H, W2), 2.0, jnp.float32),
                depth1=jnp.full((tb, H, W2), 2.0, jnp.float32))

        base = jax.random.PRNGKey(9)
        state, m = trainer.step(state, mk_batch(base), base)
        log(tag, "compiled, loss", float(m["loss"]))
        keys = [jax.random.fold_in(base, i + 1) for i in range(5)]
        batches = jax.block_until_ready([mk_batch(k) for k in keys])
        t = time.perf_counter()
        for i in range(5):
            state, m = trainer.step(state, batches[i], keys[i])
        loss = float(m["loss"])
        sps = 5 / (time.perf_counter() - t)
        log(f"{tag}: {sps:.3f} steps/s = {sps * tb:.1f} pairs/s "
            f"(loss {loss:.3f})")
        del trainer, state
    except Exception as e:
        log(tag, "FAILED:", type(e).__name__, str(e)[:200])

log("ALL DONE")
