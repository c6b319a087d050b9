"""Classical / precomputed feature matching baselines (host-side).

Equivalent of crockwell/far:
mapfree_6dreg/lib/models/matching/feature_matching.py:
- PrecomputedMatching: correspondences precomputed by a learned matcher
  and stored per pair in .npz shards
- SIFTMatching: rootSIFT + ratio-test matching. Like the reference, this
  baseline rides OpenCV's native implementation on the host — it exists
  for comparison, the production path is the on-device LoFTR matcher.

Both return padded (K, 2, 2) arrays + masks so they drop into the
static-shape solver unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def pad_matches(pts0: np.ndarray, pts1: np.ndarray,
                max_matches: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad/truncate to (K, 2) + (K,) mask."""
    k = min(len(pts0), max_matches)
    out0 = np.zeros((max_matches, 2), np.float32)
    out1 = np.zeros((max_matches, 2), np.float32)
    valid = np.zeros(max_matches, bool)
    out0[:k] = pts0[:k]
    out1[:k] = pts1[:k]
    valid[:k] = True
    return out0, out1, valid


class PrecomputedMatching:
    """Look up correspondences from an .npz store.

    Store format: np.savez(path, **{f"{name0}-{name1}": (N, 4) array})
    with rows [x0, y0, x1, y1] (matching the reference's
    correspondences_*.npz files).
    """

    def __init__(self, npz_path, max_matches: int = 1024):
        self.store = np.load(npz_path, allow_pickle=True)
        self.max_matches = max_matches

    def match(self, name0: str, name1: str):
        key = f"{name0}-{name1}"
        if key not in self.store:
            empty = np.zeros((0, 2), np.float32)
            return pad_matches(empty, empty, self.max_matches)
        corr = np.asarray(self.store[key], np.float32)
        return pad_matches(corr[:, :2], corr[:, 2:4], self.max_matches)


class SIFTMatching:
    """rootSIFT + ratio-test matching via OpenCV (host baseline)."""

    def __init__(self, num_features: int = 2048,
                 ratio_threshold: float = 0.8, max_matches: int = 1024):
        import cv2

        self.cv2 = cv2
        self.sift = cv2.SIFT_create(num_features)
        self.ratio = ratio_threshold
        self.max_matches = max_matches

    def _root_sift(self, desc: Optional[np.ndarray]) -> Optional[np.ndarray]:
        if desc is None:
            return None
        desc = desc / (np.abs(desc).sum(axis=1, keepdims=True) + 1e-7)
        return np.sqrt(desc)

    def match(self, img0: np.ndarray, img1: np.ndarray):
        """img: float [0,1] (H, W[, 1]) or uint8 grayscale."""
        cv2 = self.cv2

        def prep(im):
            im = np.asarray(im).squeeze()
            if im.dtype != np.uint8:
                im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
            return im

        k0, d0 = self.sift.detectAndCompute(prep(img0), None)
        k1, d1 = self.sift.detectAndCompute(prep(img1), None)
        d0, d1 = self._root_sift(d0), self._root_sift(d1)
        empty = np.zeros((0, 2), np.float32)
        if d0 is None or d1 is None or len(d0) < 2 or len(d1) < 2:
            return pad_matches(empty, empty, self.max_matches)

        bf = cv2.BFMatcher()
        knn = bf.knnMatch(d0, d1, k=2)
        good = [m for m, n in knn if m.distance < self.ratio * n.distance]
        if not good:
            return pad_matches(empty, empty, self.max_matches)
        pts0 = np.float32([k0[m.queryIdx].pt for m in good])
        pts1 = np.float32([k1[m.trainIdx].pt for m in good])
        return pad_matches(pts0, pts1, self.max_matches)


def precompute_matches(
    dataset, indices, matcher_fn, out_path,
) -> Dict[str, np.ndarray]:
    """Run a matcher over dataset pairs and store an .npz shard.

    Equivalent of crockwell/far:
    mapfree_6dreg/etc/feature_matching_baselines/compute.py. matcher_fn
    takes (sample) -> (pts0 (N,2), pts1 (N,2)).
    """
    store = {}
    for i in indices:
        s = dataset[int(i)]
        pts0, pts1 = matcher_fn(s)
        n0, n1 = s["pair_names"]
        store[f"{n0}-{n1}"] = np.concatenate(
            [np.asarray(pts0, np.float32), np.asarray(pts1, np.float32)], -1)
    np.savez_compressed(out_path, **store)
    return store
