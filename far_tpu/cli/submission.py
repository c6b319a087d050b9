"""Map-free submission CLI.

Equivalent of crockwell/far: mapfree_6dreg/submission.py: run the
map-free pipeline over a split and write the official submission zip
(one pose_<scene>.txt per scene with world-to-cam quaternions +
confidence = inlier count).

    python -m far_tpu.cli.submission --data_dir <mapfree_root> --split val \
        --out submission.zip
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.data import MapFreeDataset
from far_tpu.eval.submission import SubmissionWriter
from far_tpu.models.sixdreg import MapfreeRegression, SixDRegConfig
from far_tpu.pipeline import init_model, mapfree_forward
from far_tpu.types import PairBatch
from far_tpu.utils.config import FARConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="far_tpu map-free submission")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--out", default="submission.zip")
    p.add_argument("--matcher_hw", default="720x544")
    p.add_argument("--reg_hw", default="368x272")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--max_pairs", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    mh, mw = (int(x) for x in args.matcher_hw.split("x"))
    rh, rw = (int(x) for x in args.reg_hw.split("x"))

    matcher_cfg = FARConfig(image_size=(mh, mw), dtype=args.dtype,
                            regress_rt=False)
    matcher, m_vars = init_model(matcher_cfg, seed=0, batch_size=1)

    reg_cfg = SixDRegConfig(image_hw=(rh, rw), dtype=args.dtype)
    reg = MapfreeRegression(reg_cfg)
    dummy = jnp.zeros((1, rh, rw, 3))
    r_vars = reg.init(jax.random.PRNGKey(1), dummy, dummy,
                      jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1)),
                      jnp.ones((1, 3)))

    if args.ckpt_dir:
        from far_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        state = mgr.restore(jax.device_get(
            {"matcher": m_vars, "regressor": r_vars}))
        m_vars, r_vars = state["matcher"], state["regressor"]
        mgr.close()

    fn = jax.jit(lambda mv, rv, b, i0, i1, k: mapfree_forward(
        matcher, mv, reg, rv, b, i0, i1, k))

    dataset = MapFreeDataset(args.data_dir, split=args.split,
                             resize_wh=(mw, mh), reg_resize_wh=(rw, rh))
    writer = SubmissionWriter()
    key = jax.random.PRNGKey(0)
    for i in range(len(dataset)):
        if args.max_pairs and i >= args.max_pairs:
            break
        s = dataset[i]
        batch = PairBatch(
            image0=jnp.asarray(s["image0"])[None],
            image1=jnp.asarray(s["image1"])[None],
            K0=jnp.asarray(s["K0"])[None],
            K1=jnp.asarray(s["K1"])[None],
        )
        key, sub = jax.random.split(key)
        R, t, gate, est = fn(
            m_vars, r_vars, batch,
            jnp.asarray(s["image0_reg"])[None],
            jnp.asarray(s["image1_reg"])[None], sub)
        writer.add_pose_matrix(
            s["scene"], s["pair_names"][1], np.asarray(R[0]),
            np.asarray(t[0]),
            confidence=float(np.asarray(est.num_inliers[0])))
    writer.write(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
