"""Spectrogram/f0 plotting for validation logging.

Parity target: reference utils/plot/plot.py:14-48 (spec_to_figure with f0
overlay) — renders mel heatmaps (optionally GT vs pred stacked) to a
matplotlib figure or PNG for TensorBoard/work-dir dumps.
"""

from __future__ import annotations

import numpy as np


def spec_to_figure(spec: np.ndarray, vmin: float = -7, vmax: float = 12,
                   f0s: dict | None = None, title: str = ""):
    """mel [T, n_mels] (or stacked comparison) -> matplotlib Figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = np.asarray(spec)
    fig = plt.figure(figsize=(12, 6))
    plt.pcolor(spec.T, vmin=vmin, vmax=vmax)
    if title:
        plt.title(title)
    if f0s is not None:
        ax = plt.gca().twinx()
        for i, (name, f0) in enumerate(f0s.items()):
            f0 = np.asarray(f0)
            ax.plot(np.arange(len(f0)), f0, label=name, linewidth=1)
        ax.set_ylim(0, 1000)
        ax.legend()
    plt.tight_layout()
    return fig


def save_spec_png(path: str, spec: np.ndarray, **kw):
    fig = spec_to_figure(spec, **kw)
    fig.savefig(path, dpi=100)
    import matplotlib.pyplot as plt

    plt.close(fig)
