# scratch: micro-timing session v2 (delete before commit)
# Same sections as _tpu_session.py minus e2e bench/train, with REAL
# synchronization: on the axon tunnel block_until_ready returns before
# remote execution finishes, so each timing fences by fetching a 4-byte
# scalar checksum of the last output (stream-ordered => all prior work
# done).
import sys
import time

t0 = time.time()
log = lambda *a: (print(f"[{time.time() - t0:7.1f}s]", *a), sys.stdout.flush())

import jax
import functools
import jax.numpy as jnp
import numpy as np

log("devices:", jax.devices())

from far_tpu.models.fine import FineMatching, FinePreprocess, gather_windows
from far_tpu.models.attention import linear_attention
from far_tpu.models.transformer import LocalFeatureTransformer
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
W = cfg.fine.window_size
WWf = W * W
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
imgs = [mk_img(i) for i in range(4)]

_checksum = jax.jit(lambda r: jnp.sum(jax.tree_util.tree_leaves(r)[0]
                                      .astype(jnp.float32)))


def sync(r):
    return float(_checksum(r))


def run(tag, fn, inputs, iters=20):
    sync(fn(*inputs[0]))  # warm
    t = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*inputs[i % len(inputs)])
    sync(out)
    dtm = (time.perf_counter() - t) / iters * 1e3
    log(f"{tag:34s} {dtm:7.2f} ms")
    return dtm


def sect(name, thunk):
    try:
        thunk()
    except Exception as e:
        log(name, "SECTION FAILED:", type(e).__name__, str(e)[:300])


pre = FinePreprocess(cfg.fine, d_model_c=Cc, dtype=dt)
match = FineMatching(cfg.fine, dtype=dt)
pvars = jax.jit(functools.partial(
    pre.init, coarse_hw=(hc, wc), stride=stride))(
    key, imgs[0], feat_f1, feat_c0, feat_c1, i_ids, j_ids)
log("pre.init done")


def _pre(pv, f, f1, c0, c1, ii, jj):
    return pre.apply(pv, f, f1, c0, c1, ii, jj, (hc, wc), stride)


pre_fn = jax.jit(_pre)
TAIL = (feat_f1, feat_c0, feat_c1, i_ids, j_ids)
f0w, f1w = pre_fn(pvars, imgs[0], *TAIL)
sync((f0w, f1w))
mvars = jax.jit(match.init)(key, f0w, f1w)
match_fn = jax.jit(lambda mv, a, b: match.apply(mv, a, b))
wins = [pre_fn(pvars, im, *TAIL) for im in imgs[:2]]
sync(wins)


def _full(pv, mv, f, f1, c0, c1, ii, jj):
    return match.apply(mv, *pre.apply(pv, f, f1, c0, c1, ii, jj,
                                      (hc, wc), stride))


full_fn = jax.jit(_full)
log("compiling done-ish; timing...")

run("fine gather+merge", pre_fn, [(pvars, im) + TAIL for im in imgs])
run("fine transformer+softargmax", match_fn, [(mvars,) + w for w in wins])
run("fine full stage", full_fn, [(pvars, mvars, im) + TAIL for im in imgs])


def _gather_only():
    f = jax.jit(lambda ff, ii: gather_windows(ff, ii, (hc, wc), stride, W))
    run("gather only (1 side)", f, [(im, i_ids) for im in imgs])


sect("gather only", _gather_only)

lft_vars = {"params": mvars["params"]["loftr_fine"]}


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
        run(f"fine transformer {tag}", jfn, [(lft_vars,) + w for w in wins])


sect("fine lft A/B", _lft_ab)


def _coarse_ab():
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
    cpairs = [(cvars, feat_c0, feat_c1), (cvars, feat_c1, feat_c0)]
    run("coarse stack sequential", cs_fn, cpairs)
    run("coarse stack batched-self", cb_fn, cpairs)


sect("coarse A/B", _coarse_ab)


def _split_merge_ab():
    import dataclasses as _dc
    cfg_n = _dc.replace(cfg, fine=_dc.replace(cfg.fine, split_merge=False))
    pre_n = FinePreprocess(cfg_n.fine, d_model_c=Cc, dtype=dt)

    def fn(pv, f, f1, c0, c1, ii, jj):
        return pre_n.apply(pv, f, f1, c0, c1, ii, jj, (hc, wc), stride)

    run("fine gather+merge (concat form)", jax.jit(fn),
        [(pvars, im) + TAIL for im in imgs])


sect("split-merge A/B", _split_merge_ab)


def _tiny_attention():
    h = cfg.fine.nhead
    d = Cf // h
    qkv = [jax.random.normal(jax.random.fold_in(key, 300 + i),
                             (B * K, WWf, h, d), dt) for i in range(6)]
    fn = jax.jit(lambda q, k, v: (linear_attention(q, k, v),
                                  linear_attention(k, q, v),
                                  linear_attention(v, q, k),
                                  linear_attention(q, v, k)))
    run("tiny-window attention (4x)", fn, [tuple(qkv[:3]), tuple(qkv[3:])])


sect("tiny attention", _tiny_attention)

log("ALL DONE")
