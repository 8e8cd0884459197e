"""Stratified plot-grid consolidation — the reference's
``consolidate_plots`` (handyspark/plot.py:18-41) re-expressed as a
STATS-LEVEL contract: per-stratum panels laid out on an
(n_rows × n_cols) grid with SHARED x/y limits computed cluster-side,
independent of any rendering backend.

Reference semantics preserved:

- grid shape: columns = distinct values of the first stratum, rows =
  distinct values of the second (1 if only one stratum) — reference
  ``_set_stratification`` (sql/dataframe.py:188-192);
- shared limits: x/y-lim = [min over panels of panel-lo, max over panels
  of panel-hi] (plot.py:22-31);
- panel subtitles from clause strings: ``' and '`` → newline, ``' == '``
  → ``=``, quotes stripped (plot.py:15-16, ``title_fom_clause``);
- figure suptitle = the plotted column name(s) (plot.py:38).

matplotlib is optional: ``PlotGrid.render()`` draws when it is
available and returns the grid itself otherwise, so tests assert on
statistics, never pixels (SURVEY.md §5).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd


def title_from_clause(clause: str) -> str:
    """Reference plot.py:15-16 (sic ``title_fom_clause``)."""
    return clause.replace(" and ", "\n").replace(" == ", "=") \
                 .replace('"', "")


@dataclass
class GridPanel:
    row: int
    col: int
    clause: str              # machine clause, e.g. 'l_returnflag == "A"'
    title: str               # rendered subtitle (title_from_clause)
    strata: dict             # {colname: value}
    stats: object            # hist DataFrame | list of bxp dicts | 2-D df
    xlim: tuple | None       # panel's own natural limits
    ylim: tuple | None


@dataclass
class PlotGrid:
    kind: str                # "hist" | "boxplot" | "scatterplot"
    title: str               # suptitle (column name(s))
    n_rows: int
    n_cols: int
    panels: list[GridPanel] = field(default_factory=list)
    xlim: tuple | None = None    # consolidated shared limits
    ylim: tuple | None = None

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    def render(self, **kwargs):
        """Draw the consolidated grid when matplotlib is importable;
        otherwise return self (stats-only environments)."""
        from .plot import _plt
        plt = _plt()
        if plt is None:
            return self
        fig, axs = plt.subplots(self.n_rows, self.n_cols, squeeze=False,
                                **kwargs)
        for p in self.panels:
            ax = axs[p.row][p.col]
            _draw_panel(ax, self.kind, p)
            ax.set_title(p.title, fontdict={"fontsize": 10})
            if self.xlim is not None:
                ax.set_xlim(self.xlim)
            if self.ylim is not None:
                ax.set_ylim(self.ylim)
        fig.suptitle(self.title)
        fig.tight_layout()
        fig.subplots_adjust(top=0.85)
        return fig, axs


def _draw_panel(ax, kind, p):
    if kind == "hist":
        if "bin_left" in p.stats.columns:
            widths = p.stats["bin_right"] - p.stats["bin_left"]
            ax.bar(p.stats["bin_left"], p.stats["count"], width=widths,
                   align="edge")
        else:
            ax.bar(p.stats.iloc[:, 0].astype(str), p.stats["count"])
    elif kind == "boxplot":
        ax.bxp(p.stats)
    else:
        ax.scatter(p.stats["x_mid"], p.stats["y_mid"],
                   s=p.stats["proportion"] * 3000)


def _consolidate(lims: list[tuple | None]) -> tuple | None:
    """Shared limits across panels = [min of lows, max of highs]
    (reference plot.py:22-27)."""
    lims = [l for l in lims if l is not None]
    if not lims:
        return None
    return (min(l[0] for l in lims), max(l[1] for l in lims))


def _layout(strata_obj) -> tuple[int, int, dict, dict]:
    """(n_rows, n_cols, col_index_by_value, row_index_by_value) from the
    OBSERVED combinations — first stratum spans columns, second spans
    rows (reference sql/dataframe.py:188-192)."""
    combos = strata_obj.combinations()
    names = strata_obj._colnames
    col_vals = sorted(combos[names[0]].dropna().unique().tolist())
    row_vals = ([None] if len(names) < 2 else
                sorted(combos[names[1]].dropna().unique().tolist()))
    return (len(row_vals), len(col_vals),
            {v: i for i, v in enumerate(col_vals)},
            {v: i for i, v in enumerate(row_vals)})


def _panel_iter(strata_obj, split_df: pd.DataFrame):
    """Yield (strata_dict, clause, row, col, sub_df) per observed combo,
    in clause order."""
    names = strata_obj._colnames
    n_rows, n_cols, col_ix, row_ix = _layout(strata_obj)
    combos = split_df[names].drop_duplicates().sort_values(names)
    for _, c in combos.iterrows():
        combo = {k: c[k] for k in names}
        mask = pd.Series(True, index=split_df.index)
        for k, v in combo.items():
            mask &= split_df[k] == v
        clause = strata_obj.clause_for(combo)
        row = 0 if len(names) < 2 else row_ix[combo[names[1]]]
        yield combo, clause, row, col_ix[combo[names[0]]], split_df[mask]


def hist_grid(strata_obj, colname: str, bins: int = 10) -> PlotGrid:
    """Stratified histogram grid: ONE grouped job computes every
    stratum's counts on globally shared bin edges (hist_stats with
    strata), then panels + shared limits are assembled driver-side."""
    from .plotstats import hist_stats
    stats = hist_stats(strata_obj._aug, colname, bins,
                       strata=strata_obj._colnames)
    n_rows, n_cols, _, _ = _layout(strata_obj)
    grid = PlotGrid("hist", colname, n_rows, n_cols)
    continuous = "bin_left" in stats.columns
    for combo, clause, row, col, sub in _panel_iter(strata_obj, stats):
        sub = sub.drop(columns=strata_obj._colnames).reset_index(drop=True)
        xlim = ((float(sub["bin_left"].min()), float(sub["bin_right"].max()))
                if continuous and len(sub) else None)
        ylim = (0.0, float(sub["count"].max())) if len(sub) else None
        grid.panels.append(GridPanel(row, col, clause,
                                     title_from_clause(clause), combo,
                                     sub, xlim, ylim))
    grid.xlim = _consolidate([p.xlim for p in grid.panels])
    grid.ylim = _consolidate([p.ylim for p in grid.panels])
    return grid


def boxplot_grid(strata_obj, colnames, k: float = 1.5,
                 **kwargs) -> PlotGrid:
    """Stratified boxplot grid: the fused wide agg computes every
    stratum's box stats; each panel holds its stratum's bxp dicts.
    Panel y-limits span whiskers and fliers; x is box position."""
    from .plotstats import boxplot_stats
    if isinstance(colnames, str):
        colnames = [colnames]
    stats = boxplot_stats(strata_obj._aug, colnames, k,
                          strata=strata_obj._colnames, **kwargs)
    n_rows, n_cols, col_ix, row_ix = _layout(strata_obj)
    names = strata_obj._colnames
    by_combo: dict[tuple, list] = {}
    for d in stats:
        key = tuple(d["strata"][s] for s in names)
        by_combo.setdefault(key, []).append(d)
    grid = PlotGrid("boxplot", ", ".join(colnames), n_rows, n_cols)
    for key in sorted(by_combo):
        combo = dict(zip(names, key))
        dicts = by_combo[key]
        los = [min([d["whislo"]] + list(d["fliers"])) for d in dicts]
        his = [max([d["whishi"]] + list(d["fliers"])) for d in dicts]
        clause = strata_obj.clause_for(combo)
        row = 0 if len(names) < 2 else row_ix[key[1]]
        grid.panels.append(GridPanel(
            row, col_ix[key[0]], clause, title_from_clause(clause), combo,
            dicts, (0.5, len(dicts) + 0.5),
            (float(min(los)), float(max(his)))))
    grid.xlim = _consolidate([p.xlim for p in grid.panels])
    grid.ylim = _consolidate([p.ylim for p in grid.panels])
    return grid


def scatterplot_grid(strata_obj, col_x: str, col_y: str,
                     bins: int = 30) -> PlotGrid:
    """Stratified 2-D bucket grid: one grouped job on globally shared
    bucket edges; panel limits are the bucket mid ranges."""
    from .plotstats import scatterplot_stats
    stats = scatterplot_stats(strata_obj._aug, col_x, col_y, bins,
                              strata=strata_obj._colnames)
    n_rows, n_cols, _, _ = _layout(strata_obj)
    grid = PlotGrid("scatterplot", f"{col_x} × {col_y}", n_rows, n_cols)
    for combo, clause, row, col, sub in _panel_iter(strata_obj, stats):
        sub = sub.drop(columns=strata_obj._colnames).reset_index(drop=True)
        xlim = ((float(sub["x_mid"].min()), float(sub["x_mid"].max()))
                if len(sub) else None)
        ylim = ((float(sub["y_mid"].min()), float(sub["y_mid"].max()))
                if len(sub) else None)
        grid.panels.append(GridPanel(row, col, clause,
                                     title_from_clause(clause), combo,
                                     sub, xlim, ylim))
    grid.xlim = _consolidate([p.xlim for p in grid.panels])
    grid.ylim = _consolidate([p.ylim for p in grid.panels])
    return grid
