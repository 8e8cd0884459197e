"""Thin matplotlib rendering veneer over the plot-statistics operators.

The reference computes plot stats cluster-side then renders locally
(README.md:15). Statistics computation lives in ``plans/plotstats.py``
(tested, matplotlib-free); this module only draws. matplotlib is NOT in
the engine's runtime container, so every entry point degrades to returning
the statistics when it is missing — tests assert on stats, never pixels
(deliberate deviation from the reference's fragile base64-PNG golden
tests, SURVEY.md §5).
"""
from __future__ import annotations

from .plotstats import boxplot_stats, hist_stats, scatterplot_stats


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError:
        return None


def hist(hdf, colname: str, bins: int = 10, ax=None, **kwargs):
    stats = hist_stats(hdf, colname, bins)
    plt = _plt()
    if plt is None:
        return stats
    if ax is None:
        _, ax = plt.subplots()
    if "bin_left" in stats.columns:
        widths = stats["bin_right"] - stats["bin_left"]
        ax.bar(stats["bin_left"], stats["count"], width=widths,
               align="edge", **kwargs)
    else:
        ax.bar(stats.iloc[:, 0].astype(str), stats["count"], **kwargs)
    ax.set_title(colname)
    return ax


def boxplot(hdf, colnames, k: float = 1.5, ax=None, **kwargs):
    stats = boxplot_stats(hdf, colnames, k)
    plt = _plt()
    if plt is None:
        return stats
    if ax is None:
        _, ax = plt.subplots()
    ax.bxp(stats, **kwargs)
    return ax


def scatterplot(hdf, col_x: str, col_y: str, bins: int = 30, ax=None,
                **kwargs):
    stats = scatterplot_stats(hdf, col_x, col_y, bins)
    plt = _plt()
    if plt is None:
        return stats
    if ax is None:
        _, ax = plt.subplots()
    ax.scatter(stats["x_mid"], stats["y_mid"],
               s=stats["proportion"] * 3000, **kwargs)
    ax.set_xlabel(col_x)
    ax.set_ylabel(col_y)
    return ax


def plot_correlations(hdf, colnames=None, ax=None, **kwargs):
    cols = colnames or hdf._types.numerical
    mat = hdf.cols[cols].corr()
    plt = _plt()
    if plt is None:
        return mat
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(mat.values, cmap="RdBu", vmin=-1, vmax=1)
    ax.set_xticks(range(len(cols)), cols, rotation=90)
    ax.set_yticks(range(len(cols)), cols)
    plt.colorbar(im, ax=ax)
    return ax


def plot_roc_curve(metrics, ax=None, **kwargs):
    """Render the ROC curve from a BinaryClassificationMetrics
    (ref evaluation.py:118-127); returns the (fpr, tpr) frame when
    matplotlib is unavailable."""
    pdf = metrics.roc().toPandas()
    plt = _plt()
    if plt is None:
        return pdf
    if ax is None:
        _, ax = plt.subplots()
    ax.plot(pdf["fpr"], pdf["tpr"], **kwargs)
    ax.plot([0, 1], [0, 1], linestyle="--")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title(f"ROC (AUC={metrics.areaUnderROC:.4f})")
    return ax


def plot_pr_curve(metrics, ax=None, **kwargs):
    """Render the precision-recall curve (ref evaluation.py:129-136)."""
    pdf = metrics.pr().toPandas()
    plt = _plt()
    if plt is None:
        return pdf
    if ax is None:
        _, ax = plt.subplots()
    ax.plot(pdf["recall"], pdf["precision"], **kwargs)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    return ax
