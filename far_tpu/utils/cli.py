"""Config-override plumbing for the CLIs.

The reference merges yacs files + ~60 argparse overrides
(crockwell/far: mp3d_loftr/train.py:188-263). Here configs are frozen
dataclasses; overrides are dotted paths applied with dataclasses.replace:
    --set match.max_matches=512 --set solver.solver=prior_ransac
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence


def _parse_value(s: str) -> Any:
    if "," in s:  # tuple values, e.g. backbone.block_dims=16,24,32
        return tuple(_parse_value(x) for x in s.split(","))
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return s


def apply_overrides(cfg, overrides: Sequence[str]):
    """Apply 'a.b.c=value' overrides to a nested frozen dataclass."""
    for ov in overrides or []:
        path, _, raw = ov.partition("=")
        keys = path.strip().split(".")
        value = _parse_value(raw.strip())

        def rec(node, ks):
            if len(ks) == 1:
                return dataclasses.replace(node, **{ks[0]: value})
            child = getattr(node, ks[0])
            return dataclasses.replace(node, **{ks[0]: rec(child, ks[1:])})

        cfg = rec(cfg, keys)
    return cfg


def build_dataset(args):
    """Dataset factory shared by the CLIs."""
    from far_tpu.data import (
        InteriornetStreetlearnDataset,
        MapFreeDataset,
        Mp3dDataset,
        SyntheticPairDataset,
    )

    if args.dataset == "synthetic":
        hw = tuple(int(x) for x in args.image_size.split("x"))
        return SyntheticPairDataset(n=args.n_synthetic, hw=hw)
    if args.dataset == "mp3d":
        return Mp3dDataset(args.data_json, args.data_dir, args.depth_dir,
                           mode=args.split)
    if args.dataset == "interiornet_streetlearn":
        return InteriornetStreetlearnDataset(args.data_json, args.data_dir)
    if args.dataset == "mapfree":
        return MapFreeDataset(args.data_dir, split=args.split)
    raise ValueError(f"unknown dataset {args.dataset}")


def add_common_args(p):
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "mp3d", "interiornet_streetlearn",
                            "mapfree"])
    p.add_argument("--data_dir", default=None)
    p.add_argument("--data_json", default=None)
    p.add_argument("--depth_dir", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--image_size", default="480x640",
                   help="HxW (synthetic + model input)")
    p.add_argument("--n_synthetic", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="config override a.b.c=value (repeatable)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p
