"""Shared seaborn plotting helpers for experiment figures.

The reference annotates pairwise significance with the ``statannotations``
package (not available here); :func:`annotate_pvalues` draws the same
bracket-with-stars annotations manually.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

__all__ = ["box_strip_plot", "annotate_pvalues", "save_figure", "set_theme"]


def set_theme() -> None:
    import seaborn as sns

    sns.set_theme(style="darkgrid")


def _stars(p: float) -> str:
    if p <= 1e-4:
        return "****"
    if p <= 1e-3:
        return "***"
    if p <= 1e-2:
        return "**"
    if p <= 5e-2:
        return "*"
    return "ns"


def box_strip_plot(
    df: pd.DataFrame,
    x: str,
    hue: str,
    ax,
    y: str = "dice_metric",
    order: list | None = None,
    hue_order: list | None = None,
):
    """Box + strip plot of dice scores grouped by ``x`` and colored by
    ``hue`` (the reference's standard figure element)."""
    import seaborn as sns

    sns.boxplot(
        df, x=x, y=y, hue=hue, ax=ax, order=order, hue_order=hue_order,
        showfliers=False, linewidth=1.0,
    )
    sns.stripplot(
        df, x=x, y=y, hue=hue, ax=ax, order=order, hue_order=hue_order,
        dodge=True, size=3, palette="dark:black", alpha=0.5, legend=False,
    )
    ax.set_xlabel("")
    ax.set_ylabel("")
    return ax


def annotate_pvalues(
    ax,
    df: pd.DataFrame,
    x: str,
    pairs: list[tuple],
    pvalues: dict[tuple, float],
    y: str = "dice_metric",
) -> None:
    """Draw bracket + star annotations for group pairs at each x position."""
    if not pvalues:
        return
    x_labels = [t.get_text() for t in ax.get_xticklabels()]
    y_max = float(df[y].max()) if len(df) else 1.0
    step = 0.06
    for i, (pair, p) in enumerate(pvalues.items()):
        # pair = (x_value, groupA, groupB) or (groupA, groupB) applied per x
        if len(pair) == 3:
            xv, _, _ = pair
            if str(xv) not in x_labels:
                continue
            xi = x_labels.index(str(xv))
            x0, x1 = xi - 0.2, xi + 0.2
        else:
            x0, x1 = 0, len(x_labels) - 1
        h = y_max + step * (i % 3 + 1)
        ax.plot([x0, x0, x1, x1], [h, h + 0.01, h + 0.01, h], lw=0.8, c="0.3")
        ax.text((x0 + x1) / 2, h + 0.012, _stars(p), ha="center", fontsize=7)


def save_figure(fig, result_dir: Path, name: str) -> None:
    result_dir = Path(result_dir)
    result_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(result_dir / f"{name}.svg")
    fig.savefig(result_dir / f"{name}.png", dpi=300)
