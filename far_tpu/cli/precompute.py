"""Matcher-precompute CLI.

Equivalent of crockwell/far:
mapfree_6dreg/etc/feature_matching_baselines/compute.py — runs a matcher
(the on-device LoFTR, SIFT, or the SuperPoint+SuperGlue pair) over a
dataset's pairs and stores correspondences as an .npz shard for the
PrecomputedMatching consumer / cached-prediction training flows.

    python -m far_tpu.cli.precompute --dataset synthetic \
        --matcher loftr --out /tmp/corr.npz --image_size 64x64
"""

from __future__ import annotations

import argparse

import numpy as np

from far_tpu.models.feature_matching import precompute_matches
from far_tpu.utils.cli import add_common_args, apply_overrides, build_dataset
from far_tpu.utils.config import FARConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="far_tpu matcher precompute")
    add_common_args(p)
    p.add_argument("--matcher", default="loftr",
                   choices=["loftr", "sift", "superglue"])
    p.add_argument("--out", default="correspondences.npz")
    p.add_argument("--max_pairs", type=int, default=0)
    return p.parse_args(argv)


def build_matcher_fn(args, cfg):
    if args.matcher == "sift":
        from far_tpu.models.feature_matching import SIFTMatching

        m = SIFTMatching(max_matches=cfg.match.max_matches)

        def fn(sample):
            p0, p1, v = m.match(sample["image0"], sample["image1"])
            return p0[v], p1[v]

        return fn

    if args.matcher == "superglue":
        import jax
        import jax.numpy as jnp

        from far_tpu.models.superglue import (
            SuperGlueConfig, SuperGlueTPU, match_pair_superglue)
        from far_tpu.models.superpoint import (
            SuperPointConfig, SuperPointTPU)

        sp = SuperPointTPU(SuperPointConfig(dtype=cfg.dtype))
        sg = SuperGlueTPU(SuperGlueConfig(dtype=cfg.dtype))
        H, W = cfg.image_size
        dummy = jnp.zeros((1, H, W, 1))
        sp_vs = sp.init(jax.random.PRNGKey(0), dummy)
        k, s, v, d = sp.apply(sp_vs, dummy, mutable=False)
        sg_vs = sg.init(jax.random.PRNGKey(1), k, s, v, d, k, s, v, d,
                        image_hw=(H, W))

        def fn(sample):
            i0 = jnp.asarray(sample["image0"])[None]
            i1 = jnp.asarray(sample["image1"])[None]
            p0, p1, ok = match_pair_superglue(sp, sp_vs, sg, sg_vs, i0, i1)
            okn = np.asarray(ok[0])
            return np.asarray(p0[0])[okn], np.asarray(p1[0])[okn]

        return fn

    # on-device LoFTR matcher
    import jax

    from far_tpu.models.loftr import FARLoFTR
    from far_tpu.pipeline import init_model
    from far_tpu.types import PairBatch
    import jax.numpy as jnp

    model, variables = init_model(cfg, seed=args.seed, batch_size=1)
    match = jax.jit(lambda v, b: model.apply(
        v, b, method=FARLoFTR.match, mutable=False))

    def fn(sample):
        batch = PairBatch(
            image0=jnp.asarray(sample["image0"])[None],
            image1=jnp.asarray(sample["image1"])[None],
            K0=jnp.asarray(sample["K0"])[None],
            K1=jnp.asarray(sample["K1"])[None],
        )
        out = match(variables, batch)
        m = out.matches
        valid = np.asarray(m.valid[0])
        return (np.asarray(m.mkpts0_f[0])[valid],
                np.asarray(m.mkpts1_f[0])[valid])

    return fn


def main(argv=None):
    args = parse_args(argv)
    H, W = (int(x) for x in args.image_size.split("x"))
    cfg = apply_overrides(FARConfig(image_size=(H, W), dtype=args.dtype),
                          args.overrides)
    dataset = build_dataset(args)
    n = len(dataset) if not args.max_pairs else min(args.max_pairs,
                                                    len(dataset))
    store = precompute_matches(dataset, range(n), build_matcher_fn(args, cfg),
                               args.out)
    print(f"wrote {len(store)} pair entries to {args.out}")


if __name__ == "__main__":
    main()
