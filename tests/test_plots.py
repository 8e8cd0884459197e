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
