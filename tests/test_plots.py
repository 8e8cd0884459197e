"""Plot-statistics operators vs numpy oracles (stats, not pixels —
SURVEY.md §5 deviation note)."""
import numpy as np
import numpy.testing as npt
import pytest

from handyspark_spark import toHandy


@pytest.fixture(scope="module")
def hdf(tables):
    return toHandy(tables["lineitem"])


@pytest.fixture(scope="module")
def pdf(pdf_tables):
    return pdf_tables["lineitem"]


def test_hist_continuous_matches_numpy(hdf, pdf):
    from handyspark_spark.plans.plotstats import hist_stats
    stats = hist_stats(hdf, "l_extendedprice", bins=10)
    counts, edges = np.histogram(pdf["l_extendedprice"], bins=10)
    npt.assert_array_almost_equal(
        np.r_[stats["bin_left"].values, stats["bin_right"].iloc[-1]], edges)
    # np.histogram and our closed-form bucketing agree except possible
    # boundary straddles; totals must match exactly
    assert stats["count"].sum() == len(pdf)
    npt.assert_array_equal(stats["count"].values, counts)


def test_hist_categorical_top_bins(hdf, pdf):
    from handyspark_spark.plans.plotstats import hist_stats
    stats = hist_stats(hdf, "l_returnflag", bins=2)
    exp = pdf["l_returnflag"].value_counts()
    assert len(stats) == 2
    npt.assert_array_equal(stats["count"].values, exp.values[:2])


def test_hist_stratified_dense_spine(hdf, pdf):
    from handyspark_spark.plans.plotstats import hist_stats
    stats = hist_stats(hdf, "l_extendedprice", bins=5,
                       strata=["l_returnflag"])
    # dense spine: every (stratum, bin) combo present, zeros filled
    assert len(stats) == 5 * pdf["l_returnflag"].nunique()
    assert stats["count"].sum() == len(pdf)


def test_boxplot_stats_match_pandas(hdf, pdf):
    from handyspark_spark.plans.plotstats import boxplot_stats
    [d] = boxplot_stats(hdf, ["l_extendedprice"], exact=True)
    col = pdf["l_extendedprice"]
    q1, med, q3 = col.quantile([0.25, 0.5, 0.75])
    npt.assert_almost_equal(d["q1"], q1)
    npt.assert_almost_equal(d["med"], med)
    npt.assert_almost_equal(d["q3"], q3)
    npt.assert_almost_equal(d["mean"], col.mean())
    iqr = q3 - q1
    infence = col[(col >= q1 - 1.5 * iqr) & (col <= q3 + 1.5 * iqr)]
    npt.assert_almost_equal(d["whislo"], infence.min())
    npt.assert_almost_equal(d["whishi"], infence.max())
    exp_fliers = col[(col < q1 - 1.5 * iqr) | (col > q3 + 1.5 * iqr)]
    assert len(d["fliers"]) == min(len(exp_fliers), 1000)


def test_boxplot_stratified(hdf, pdf):
    from handyspark_spark.plans.plotstats import boxplot_stats
    ds = boxplot_stats(hdf, ["l_extendedprice"], exact=True,
                       strata=["l_returnflag"])
    assert len(ds) == pdf["l_returnflag"].nunique()
    for d in ds:
        flag = d["strata"]["l_returnflag"]
        col = pdf.loc[pdf["l_returnflag"] == flag, "l_extendedprice"]
        npt.assert_almost_equal(d["med"], col.median())


def test_scatterplot_proportions(hdf, pdf):
    from handyspark_spark.plans.plotstats import scatterplot_stats
    stats = scatterplot_stats(hdf, "l_quantity", "l_extendedprice",
                              bins=10)
    npt.assert_almost_equal(stats["proportion"].sum(), 1.0)
    assert stats["count"].sum() == len(pdf)
    assert len(stats) <= 100


def test_plot_veneer_returns_stats_without_matplotlib(hdf):
    from handyspark_spark.plans import plot
    res = plot.hist(hdf, "l_extendedprice", bins=5)
    # matplotlib absent in this container -> stats DataFrame comes back
    import pandas as pd
    assert isinstance(res, pd.DataFrame) or hasattr(res, "figure")


def test_strata_accessor_hist_and_boxplot(hdf, pdf):
    """Plot stats through the stratify().cols accessor path
    (StrataColumns wiring, not just direct plotstats calls)."""
    strat = hdf.stratify(["l_returnflag"])
    h = strat.cols["l_extendedprice"].hist(bins=4)
    assert h["count"].sum() == len(pdf)
    assert set(h["l_returnflag"]) == set(pdf["l_returnflag"].unique())
    b = strat.cols[["l_extendedprice"]].boxplot()
    assert len(b) == pdf["l_returnflag"].nunique()
    assert all("strata" in d for d in b)


# -- consolidated plot grids (reference plot.py:18-41 stratified cases) ----

def test_hist_grid_shape_shared_limits_and_counts(hdf, pdf):
    """stratify(col).cols[x].hist(grid=True): one panel per stratum
    value, shared xlim spanning global bin edges, shared ylim = max
    panel count, subtitles from clause strings."""
    grid = (hdf.stratify(["l_returnflag"])
            .cols["l_extendedprice"].hist(bins=6, grid=True))
    nflags = pdf["l_returnflag"].nunique()
    assert grid.shape == (1, nflags)
    assert len(grid.panels) == nflags
    assert {p.col for p in grid.panels} == set(range(nflags))
    # every panel shares the global binning -> identical panel xlims
    lo = pdf["l_extendedprice"].min()
    hi = pdf["l_extendedprice"].max()
    np.testing.assert_allclose(grid.xlim, (lo, hi))
    assert grid.ylim[0] == 0.0
    assert grid.ylim[1] == max(p.stats["count"].max() for p in grid.panels)
    # per-panel counts == pandas per-stratum histogram on GLOBAL edges
    edges = np.linspace(lo, hi, 7)
    for p in grid.panels:
        flag = p.strata["l_returnflag"]
        exp, _ = np.histogram(pdf[pdf["l_returnflag"] == flag]
                              ["l_extendedprice"], bins=edges)
        npt.assert_array_equal(p.stats["count"].values, exp)
        assert p.title == f"l_returnflag={flag}"
        assert p.clause == f'l_returnflag == "{flag}"'


def test_hist_grid_two_strata_rows_and_cols(hdf, pdf):
    """Two strata: first spans columns, second spans rows (reference
    sql/dataframe.py:188-192)."""
    grid = (hdf.stratify(["l_returnflag", "l_linestatus"])
            .cols["l_quantity"].hist(bins=4, grid=True))
    assert grid.n_cols == pdf["l_returnflag"].nunique()
    assert grid.n_rows == pdf["l_linestatus"].nunique()
    seen = {(p.row, p.col) for p in grid.panels}
    assert len(seen) == len(grid.panels)       # distinct cells
    for p in grid.panels:
        assert "\n" in p.title                 # clause newline join


def test_boxplot_grid_consolidated_ylim(hdf, pdf):
    grid = (hdf.stratify(["l_returnflag"])
            .cols[["l_extendedprice"]].boxplot(grid=True))
    assert grid.shape == (1, pdf["l_returnflag"].nunique())
    # shared ylim covers every panel's whisker+flier span
    for p in grid.panels:
        assert grid.ylim[0] <= p.ylim[0] and p.ylim[1] <= grid.ylim[1]
        assert len(p.stats) == 1               # one box per panel
        assert p.stats[0]["label"] == "l_extendedprice"
    assert any(p.ylim[1] == grid.ylim[1] for p in grid.panels)
    # grid medians match the flat (non-grid) stratified stats
    flat = (hdf.stratify(["l_returnflag"])
            .cols[["l_extendedprice"]].boxplot())
    med = {d["strata"]["l_returnflag"]: d["med"] for d in flat}
    for p in grid.panels:
        assert p.stats[0]["med"] == med[p.strata["l_returnflag"]]


def test_scatterplot_grid_shared_buckets(hdf):
    grid = (hdf.stratify(["l_returnflag"])
            .cols[["l_quantity", "l_extendedprice"]]
            .scatterplot(bins=8, grid=True))
    assert grid.n_rows == 1
    for p in grid.panels:
        assert p.stats["proportion"].sum() == pytest.approx(1.0)
    assert grid.xlim[0] <= min(p.xlim[0] for p in grid.panels)


def test_grid_render_degrades_without_matplotlib(hdf):
    grid = (hdf.stratify(["l_returnflag"])
            .cols["l_extendedprice"].hist(bins=3, grid=True))
    res = grid.render()
    # matplotlib absent in the container -> the grid itself comes back
    from handyspark_spark.plans.plot import _plt
    if _plt() is None:
        assert res is grid
    else:
        assert res[0] is not None


def test_bucket_strata_grid_clause_titles(hdf):
    """Bucket strata panels are titled by bucket clause ranges."""
    from handyspark_spark.operators.strata import Bucket
    grid = (hdf.stratify([Bucket("l_quantity", 2)])
            .cols["l_extendedprice"].hist(bins=3, grid=True))
    assert grid.shape == (1, 2)
    for p in grid.panels:
        assert "l_quantity" in p.clause
