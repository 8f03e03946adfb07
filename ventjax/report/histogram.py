"""Masked-signal histogram figure: the reference's "show histogram?"
roadmap item (/root/reference/README.md:26).

Renders the linear-binning view of a study (Mu He 2016, the VDP_lb method
at Vent_Analysis.py:254-257): normalized masked signal distribution with
the six clinical bins delimited by the configured edges.  Bin identity is
carried primarily by x-position between labeled dashed edge lines; the
fill colors reinforce the standard clinical reading (reds = defect,
greens = normal, blues = hyper) and are never the only cue.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# Clinical bin colors (defect -> hyperventilated), mid-lightness so the
# neutral-ink labels stay readable on white.
BIN_COLORS = ("#b3342c", "#e07b39", "#e8c84a", "#5aa05a", "#3b7fb8",
              "#7a4fa3")
BIN_LABELS = ("defect", "low", "normal", "normal", "high", "hyper")
_INK = "#333333"
_MUTED = "#777777"


def signal_histogram(
    path: str,
    signal: np.ndarray,
    mask: np.ndarray,
    edges: Sequence[float] = (0.16, 0.34, 0.52, 0.70, 0.88),
    percentile: float = 0.99,
    bins: int = 80,
    title: Optional[str] = None,
    vdp_lb: Optional[float] = None,
) -> str:
    """Save the masked-signal histogram PNG; returns `path`.

    `signal` is the (N4-corrected) volume; values under ``mask > 0`` are
    normalized by the reference's floor-index percentile
    (sorted[int(count*percentile)], Vent_Analysis.py:255) so the x-axis
    matches the linear-binning bin edges exactly.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vals = np.asarray(signal, np.float64)[np.asarray(mask) > 0]
    if vals.size == 0:
        raise ValueError("empty mask: nothing to histogram")
    denom = np.sort(vals)[int(len(vals) * percentile)]
    if denom == 0:
        raise ValueError("normalization percentile is zero")
    norm = vals / denom
    edges = tuple(float(e) for e in edges)
    xmax = max(1.1, float(np.quantile(norm, 0.999)) * 1.05)
    hist_edges = np.linspace(0.0, xmax, bins + 1)
    counts, _ = np.histogram(norm, bins=hist_edges)
    centers = 0.5 * (hist_edges[:-1] + hist_edges[1:])
    # color each histogram bar by the clinical bin its center falls in
    bin_idx = np.searchsorted(edges, centers, side="left")
    colors = [BIN_COLORS[i] for i in bin_idx]

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=130)
    ax.bar(centers, counts, width=(hist_edges[1] - hist_edges[0]) * 0.92,
           color=colors, linewidth=0)
    for e in edges:
        ax.axvline(e, color=_MUTED, linestyle="--", linewidth=1)
    # region labels in neutral ink above the plot (identity never
    # color-alone: position between the dashed edges is the primary cue)
    bounds = (0.0,) + edges + (xmax,)
    top = ax.get_ylim()[1]
    shown = set()
    for i in range(6):
        label = BIN_LABELS[i]
        if label in shown:  # the two "normal" bins share one label
            continue
        lo = bounds[i]
        hi = bounds[i + 1] if label != "normal" else bounds[i + 2]
        shown.add(label)
        ax.text(0.5 * (lo + min(hi, xmax)), top * 1.02, label,
                ha="center", va="bottom", fontsize=8, color=_INK)
    ax.set_xlim(0, xmax)
    ax.set_xlabel(f"signal / {int(percentile * 100)}th-percentile signal",
                  color=_INK)
    ax.set_ylabel("voxel count", color=_INK)
    head = title or "Masked ventilation signal"
    if vdp_lb is not None:
        head += f"   (VDP$_{{lb}}$ = {float(vdp_lb):.1f}%)"
    # pad the title above the bin region labels (which sit just over the
    # axis top)
    ax.set_title(head, color=_INK, fontsize=11, pad=20)
    ax.spines[["top", "right"]].set_visible(False)
    ax.tick_params(colors=_MUTED, labelsize=8)
    ax.grid(axis="y", color="#e6e6e6", linewidth=0.6)
    ax.set_axisbelow(True)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
