"""Statistical tests — JVM-free re-derivations of reference
``handyspark/stats.py`` (which bridged to commons-math / mllib KS via py4j).

- ``ttest``: Welch two-sample t from ONE grouped aggregation (mean, var,
  count per group) + pure-python p-value (incomplete beta). Pairwise over
  all group combinations, like the reference's pairwise loop.
- ``ks_test``: one-sample Kolmogorov–Smirnov D statistic via a native
  ECDF plan — sort + row_number window — against any callable CDF
  (normal/uniform built in; the reference shelled out to commons-math for
  18 distributions, we accept an arbitrary python cdf).

Scale note: the KS window ranks globally (single-partition window) — the
standard distributed alternative is a two-pass partition-offset ranking;
acceptable here because the D-stat needs only (value, rank) and values
can be pre-aggregated to distinct values with counts first (done below),
which bounds the window input to |distinct values|.
"""
from __future__ import annotations

import math
from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .special import norm_cdf, t_sf


class StatisticalSummaryValues:
    """Per-group summary (mean, variance, n, min, max) from one agg —
    the commons-math SSV equivalent (ref stats.py:6-20)."""

    def __init__(self, df: DataFrame, colname: str, group_col: str):
        rows = (df.groupBy(group_col)
                .agg(F.mean(colname).alias("mean"),
                     F.variance(colname).alias("variance"),
                     F.count(colname).alias("n"),
                     F.min(colname).alias("min"),
                     F.max(colname).alias("max"))
                .collect())
        self.groups = {r[group_col]: {"mean": r["mean"],
                                      "variance": r["variance"],
                                      "n": r["n"], "min": r["min"],
                                      "max": r["max"]}
                       for r in rows}


def welch_t(s1: dict, s2: dict) -> tuple[float, float, float]:
    """(t, df, p) from two summary dicts."""
    v1n = s1["variance"] / s1["n"]
    v2n = s2["variance"] / s2["n"]
    t = (s1["mean"] - s2["mean"]) / math.sqrt(v1n + v2n)
    df = (v1n + v2n) ** 2 / (v1n ** 2 / (s1["n"] - 1)
                             + v2n ** 2 / (s2["n"] - 1))
    return t, df, t_sf(abs(t), df)


def ttest(df: DataFrame, colname: str, group_col: str) -> pd.DataFrame:
    """Pairwise Welch t-tests between every pair of groups
    (ref stats.py:22-34). One Spark job total."""
    ssv = StatisticalSummaryValues(df, colname, group_col)
    rows = []
    for g1, g2 in combinations(sorted(ssv.groups), 2):
        t, dof, p = welch_t(ssv.groups[g1], ssv.groups[g2])
        rows.append({"group_1": g1, "group_2": g2, "t_stat": t,
                     "dof": dof, "p_value": p})
    return pd.DataFrame(rows)


def _ecdf_plan(df: DataFrame, colname: str) -> DataFrame:
    """(value, cum_count, total) over distinct values — the pre-aggregation
    bounds the global window to |distinct| rows."""
    counts = (df.select(F.col(colname).cast("double").alias("v"))
                .dropna()
                .groupBy("v").agg(F.count(F.lit(1)).alias("c")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    return (counts.withColumn("cum", F.sum("c").over(w))
                  .withColumn("total", F.sum("c").over(
                      Window.partitionBy())))


def ks_test(df: DataFrame, colname: str, dist: str = "normal",
            params: tuple | None = None, cdf=None) -> dict:
    """One-sample KS: D = sup_x |ECDF(x) - CDF(x)| (both one-sided gaps
    evaluated, as the exact definition requires). Returns
    {statistic, reject_at_05} with the standard asymptotic critical value
    1.358/sqrt(n) (alpha=.05)."""
    ecdf = _ecdf_plan(df, colname).collect()
    if cdf is None:
        if dist == "normal":
            if params is None:
                r = df.agg(F.mean(colname), F.stddev(colname)).collect()[0]
                params = (float(r[0]), float(r[1]))
            mu, sd = params
            cdf = lambda x: norm_cdf((x - mu) / sd)
        elif dist == "uniform":
            if params is None:
                r = df.agg(F.min(colname), F.max(colname)).collect()[0]
                params = (float(r[0]), float(r[1]))
            lo, hi = params
            cdf = lambda x: min(1.0, max(0.0, (x - lo) / (hi - lo)))
        else:
            raise ValueError(f"unknown dist {dist!r}; pass cdf=")
    d = 0.0
    n = ecdf[0]["total"] if ecdf else 0
    for r in ecdf:
        c = cdf(r["v"])
        d = max(d, abs(r["cum"] / n - c), abs((r["cum"] - r["c"]) / n - c))
    crit = 1.358 / math.sqrt(n) if n else float("nan")
    return {"statistic": d, "n": n, "critical_05": crit,
            "reject_at_05": d > crit}


# reference-facing aliases (handyspark.stats drop-in names)
tTest = ttest
KolmogorovSmirnovTest = ks_test
