"""Match visualization figures.

Equivalent of crockwell/far: mp3d_loftr/src/utils/plotting.py
(make_matching_figures): side-by-side pair with match lines colored by
epipolar error (green = correct under the threshold), dynamic alpha by
match count, and the text box with counts/precision.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def error_colormap(err: np.ndarray, thr: float, alpha: float = 1.0):
    """Green below thr, fading to red at 2*thr (reference convention)."""
    x = 1.0 - np.clip(err / (thr * 2.0), 0.0, 1.0)
    return np.stack([2 - x * 2, x * 2, np.zeros_like(x),
                     np.full_like(x, alpha)], -1).clip(0, 1)


def dynamic_alpha(n_matches: int,
                  milestones=(0, 300, 1000, 2000),
                  alphas=(1.0, 0.8, 0.4, 0.2)) -> float:
    if n_matches == 0:
        return 1.0
    ranges = list(zip(alphas, alphas[1:] + (alphas[-1],)))
    for (m0, m1), (a0, a1) in zip(zip(milestones, milestones[1:] + (1e9,)),
                                  ranges):
        if m0 <= n_matches < m1:
            if m1 >= 1e9:
                return a0
            return a0 + (a1 - a0) * (n_matches - m0) / (m1 - m0)
    return alphas[-1]


def make_matching_figure(
    img0: np.ndarray,
    img1: np.ndarray,
    mkpts0: np.ndarray,
    mkpts1: np.ndarray,
    epi_errs: Optional[np.ndarray] = None,
    epi_thr: float = 5e-4,
    text: Optional[list] = None,
    dpi: int = 75,
):
    """One pair figure with error-colored match lines."""
    img0 = np.asarray(img0).squeeze()
    img1 = np.asarray(img1).squeeze()
    n = len(mkpts0)
    alpha = dynamic_alpha(n)
    if epi_errs is not None and n:
        color = error_colormap(np.asarray(epi_errs), epi_thr, alpha)
        precision = float(np.mean(np.asarray(epi_errs) < epi_thr))
    else:
        color = np.tile([0.0, 1.0, 0.0, alpha], (n, 1))
        precision = float("nan")

    fig, axes = plt.subplots(1, 2, figsize=(10, 6), dpi=dpi)
    for ax, im in zip(axes, (img0, img1)):
        ax.imshow(im, cmap="gray", vmin=0, vmax=1)
        ax.get_yaxis().set_ticks([])
        ax.get_xaxis().set_ticks([])
    plt.tight_layout(pad=1)

    if n:
        fig.canvas.draw()
        t0 = axes[0].transData.transform(mkpts0)
        t1 = axes[1].transData.transform(mkpts1)
        inv = fig.transFigure.inverted()
        f0 = inv.transform(t0)
        f1 = inv.transform(t1)
        fig.lines = [
            matplotlib.lines.Line2D(
                (f0[i, 0], f1[i, 0]), (f0[i, 1], f1[i, 1]),
                transform=fig.transFigure, c=color[i], linewidth=1)
            for i in range(n)
        ]
        axes[0].scatter(mkpts0[:, 0], mkpts0[:, 1], c=color, s=4)
        axes[1].scatter(mkpts1[:, 0], mkpts1[:, 1], c=color, s=4)

    lines = text or [f"#matches: {n}", f"precision: {precision:.2f}"]
    axes[0].text(0.01, 0.99, "\n".join(lines),
                 transform=axes[0].transAxes, va="top", ha="left",
                 fontsize=12, color="w",
                 bbox=dict(facecolor="k", alpha=0.6, pad=2))
    return fig


def make_matching_figures(batch_out, batch, mode: str = "evaluation",
                          epi_errs: Optional[np.ndarray] = None) -> Dict:
    """Figures for every pair in a FarOutput batch."""
    figs = {mode: []}
    m = batch_out.matches
    valid = np.asarray(m.valid)
    for b in range(valid.shape[0]):
        v = valid[b]
        figs[mode].append(make_matching_figure(
            np.asarray(batch.image0[b]), np.asarray(batch.image1[b]),
            np.asarray(m.mkpts0_f[b])[v], np.asarray(m.mkpts1_f[b])[v],
            None if epi_errs is None else np.asarray(epi_errs[b])[v],
        ))
    return figs
