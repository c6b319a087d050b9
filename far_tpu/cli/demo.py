"""Single-pair pose demo.

Equivalent of crockwell/far: mp3d_loftr/demo.py and
mapfree_6dreg/demo.py: loads two images (or renders a synthetic pair),
runs the full FAR loop once, and prints the predicted [R|t].

    python -m far_tpu.cli.demo --image0 a.png --image1 b.png \
        --fx 517.97 --fy 517.97 --cx 320 --cy 240
    python -m far_tpu.cli.demo --synthetic --image_size 64x64
    # map-free family (metric 6DReg regressor + MoE, 2-round prior loop;
    # per-image intrinsics like the reference's --k0/--k1):
    python -m far_tpu.cli.demo --mapfree --image0 a.jpg --image1 b.jpg \
        --k0 1672 1672 540 960 --k1 1672 1672 540 960 \
        --ckpt_dir /path/to/mapfree_ckpt
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from far_tpu.pipeline import far_forward, init_model
from far_tpu.types import PairBatch
from far_tpu.utils.cli import apply_overrides
from far_tpu.utils.config import FARConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="far_tpu demo")
    p.add_argument("--image0")
    p.add_argument("--image1")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image_size", default="480x640")
    p.add_argument("--fx", type=float, default=517.97)
    p.add_argument("--fy", type=float, default=517.97)
    p.add_argument("--cx", type=float, default=320.0)
    p.add_argument("--cy", type=float, default=240.0)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--k0", type=float, nargs=4, default=None,
                   metavar=("FX", "FY", "CX", "CY"),
                   help="intrinsics of image0 (defaults to --fx/--fy/...)")
    p.add_argument("--k1", type=float, nargs=4, default=None,
                   metavar=("FX", "FY", "CX", "CY"),
                   help="intrinsics of image1 (defaults to --k0)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mapfree", action="store_true",
                   help="use the map-free 6DReg pipeline (metric t)")
    p.add_argument("--reg_size", default="368x272",
                   help="HxW of the map-free regressor input")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    return p.parse_args(argv)


def run_mapfree(args, img0, img1, K, gt):
    """Map-free demo path (reference mapfree_6dreg/demo.py:51-126)."""
    import jax
    import jax.numpy as jnp

    from far_tpu.models.sixdreg import MapfreeRegression, SixDRegConfig
    from far_tpu.pipeline import init_model, mapfree_forward
    from far_tpu.types import PairBatch

    H, W = (int(x) for x in args.image_size.split("x"))
    rh, rw = (int(x) for x in args.reg_size.split("x"))
    mcfg = apply_overrides(
        FARConfig(image_size=(H, W), dtype=args.dtype, regress_rt=False),
        args.overrides)
    matcher, m_vars = init_model(mcfg, seed=0, batch_size=1)

    rcfg = SixDRegConfig(image_hw=(rh, rw), dtype=args.dtype)
    reg = MapfreeRegression(rcfg)
    dummy = jnp.zeros((1, rh, rw, 3))
    r_vars = reg.init(jax.random.PRNGKey(1), dummy, dummy,
                      jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1)),
                      jnp.ones((1, 3)))

    if args.ckpt_dir:
        # same two-tree layout the submission CLI writes/reads
        from far_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        state = mgr.restore(jax.device_get(
            {"matcher": m_vars, "regressor": r_vars}))
        m_vars, r_vars = state["matcher"], state["regressor"]
        mgr.close()

    K0, K1 = K
    gray0 = img0 if img0.shape[-1] == 1 else img0.mean(-1, keepdims=True)
    gray1 = img1 if img1.shape[-1] == 1 else img1.mean(-1, keepdims=True)
    batch = PairBatch(
        image0=jnp.asarray(gray0)[None], image1=jnp.asarray(gray1)[None],
        K0=jnp.asarray(K0)[None], K1=jnp.asarray(K1)[None])
    i0r = jax.image.resize(jnp.asarray(img0)[None], (1, rh, rw, 3),
                           "bilinear") if img0.shape[-1] == 3 else \
        jnp.tile(jax.image.resize(jnp.asarray(gray0)[None],
                                  (1, rh, rw, 1), "bilinear"), (1, 1, 1, 3))
    i1r = jax.image.resize(jnp.asarray(img1)[None], (1, rh, rw, 3),
                           "bilinear") if img1.shape[-1] == 3 else \
        jnp.tile(jax.image.resize(jnp.asarray(gray1)[None],
                                  (1, rh, rw, 1), "bilinear"), (1, 1, 1, 3))

    R, t, gate, est = jax.jit(
        lambda mv, rv, b, a0, a1, k: mapfree_forward(
            matcher, mv, reg, rv, b, a0, a1, k)
    )(m_vars, r_vars, batch, i0r, i1r, jax.random.PRNGKey(0))

    rt = np.concatenate([np.asarray(R[0]), np.asarray(t[0])[:, None]], -1)
    np.set_printoptions(precision=4, suppress=True)
    print("predicted metric [R|t] (map-free 6DReg):")
    print(rt)
    print(f"solver inliers: {float(np.asarray(est.num_inliers[0])):.0f}")
    if gt is not None:
        print("ground truth [R|t]:")
        print(gt[:3])
    return rt


def main(argv=None):
    args = parse_args(argv)
    H, W = (int(x) for x in args.image_size.split("x"))
    cfg = FARConfig(image_size=(H, W), dtype=args.dtype)
    cfg = apply_overrides(cfg, args.overrides)

    if args.synthetic or not args.image0:
        from far_tpu.data import SyntheticPairDataset

        s = SyntheticPairDataset(n=1, hw=(H, W))[0]
        img0, img1 = s["image0"], s["image1"]
        K0 = K1 = s["K0"]
        gt = s["T_0to1"]
    else:
        from far_tpu.data.io import read_gray

        img0 = read_gray(args.image0, (W, H))
        img1 = read_gray(args.image1, (W, H))

        def mk_k(four):
            fx, fy, cx, cy = four
            return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                            np.float32)

        K0 = mk_k(args.k0 if args.k0 else
                  (args.fx, args.fy, args.cx, args.cy))
        K1 = mk_k(args.k1) if args.k1 else K0
        gt = None

    if args.mapfree:
        return run_mapfree(args, img0, img1, (K0, K1), gt)

    model, variables = init_model(cfg, seed=0, batch_size=1)
    if args.ckpt_dir:
        from far_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        state = mgr.restore(jax.device_get(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        mgr.close()

    batch = PairBatch(
        image0=jnp.asarray(img0)[None], image1=jnp.asarray(img1)[None],
        K0=jnp.asarray(K0)[None], K1=jnp.asarray(K1)[None],
    )
    out = jax.jit(lambda v, b, k: far_forward(model, v, b, k))(
        variables, batch, jax.random.PRNGKey(0))
    rt = np.concatenate(
        [np.asarray(out.R[0]), np.asarray(out.t[0])[:, None]], -1)
    np.set_printoptions(precision=4, suppress=True)
    print("predicted [R|t]:")
    print(rt)
    print(f"matches: {int(np.asarray(out.matches.valid.sum()))}, "
          f"inliers: {float(np.asarray(out.num_inliers[0])):.0f}, "
          f"solved: {bool(np.asarray(out.success[0]))}")
    if gt is not None:
        print("ground truth [R|t]:")
        print(gt[:3])
    return rt


if __name__ == "__main__":
    main()
