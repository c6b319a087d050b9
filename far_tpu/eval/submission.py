"""Map-free submission writer.

Equivalent of crockwell/far: mapfree_6dreg/submission.py:44-82: collects
per-frame pose estimates (world-to-cam quaternion + translation +
confidence) per scene and writes the official `pose_<scene>.txt` files
into a submission zip.
"""

from __future__ import annotations

import zipfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

import numpy as np

from far_tpu.eval.mapfree_benchmark import quat_to_matrix


class SubmissionWriter:
    """Accumulate (scene, frame) -> pose records, then zip them."""

    def __init__(self):
        self._scenes: Dict[str, List[str]] = defaultdict(list)

    def add(self, scene: str, frame_path: str, q: np.ndarray,
            t: np.ndarray, confidence: float = 0.0) -> None:
        q = np.asarray(q, np.float64)
        t = np.asarray(t, np.float64)
        if not (np.isfinite(q).all() and np.isfinite(t).all()):
            return  # reference drops NaN/Inf predictions (submission.py:62-63)
        vals = " ".join(f"{v:.6f}" for v in (*q, *t, confidence))
        self._scenes[scene].append(f"{frame_path} {vals}")

    def add_pose_matrix(self, scene: str, frame_path: str, R: np.ndarray,
                        t: np.ndarray, confidence: float = 0.0) -> None:
        from far_tpu.geometry.rotations import matrix_to_quaternion
        import jax.numpy as jnp

        q = np.asarray(matrix_to_quaternion(jnp.asarray(R, jnp.float32)))
        self.add(scene, frame_path, q, t, confidence)

    def write(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for scene, lines in self._scenes.items():
                zf.writestr(f"pose_{scene}.txt", "\n".join(lines) + "\n")
