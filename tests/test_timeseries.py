"""Differential tests for operators/timeseries.py and operators/quality.py."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tsdf(spark):
    rng = np.random.RandomState(9)
    n = 300
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.randint(0, 6, n),
        "ts": pd.Timestamp("2024-03-01") + pd.to_timedelta(
            np.sort(rng.randint(0, 14 * 86400, n)), unit="s"),
        "state": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.uniform(0, 10, n), 3)})
    return spark.createDataFrame(pdf), pdf


def test_resample_grid_is_dense_and_sums_match(tsdf):
    from handyspark_spark.operators.timeseries import resample
    df, pdf = tsdf
    got = resample(df, "ts", "user_id", 86400, "value",
                   agg="sum").toPandas()
    for uid, g in got.groupby("user_id"):
        # dense daily grid from first to last event day
        days = g["bucket_ts"].sort_values()
        assert (days.diff().dropna() == pd.Timedelta(days=1)).all()
        sub = pdf[pdf["user_id"] == uid]
        assert abs(g["sum_value"].dropna().sum() -
                   sub["value"].sum()) < 1e-5
    # total value preserved
    assert abs(got["sum_value"].dropna().sum() -
               pdf["value"].sum()) < 1e-4


def test_resample_ffill_has_no_gaps(tsdf):
    from handyspark_spark.operators.timeseries import resample
    df, _ = tsdf
    got = resample(df, "ts", "user_id", 86400, "value",
                   agg="sum", fill="ffill").toPandas()
    assert not got["sum_value"].isna().any()


def test_resample_matches_pandas_with_null_values(spark):
    """Differential pin vs pandas resample+ffill, including the edge the
    run-length plan must preserve: an occupied bucket whose aggregate is
    NULL (all values null) is SKIPPED by ffill (carries the older
    value), while the plain path shows NULL only at that bucket."""
    from handyspark_spark.operators.timeseries import resample
    rng = np.random.RandomState(42)
    n = 500
    pdf = pd.DataFrame({
        "user_id": rng.randint(0, 5, n),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.randint(0, 30 * 86400, n), unit="s"),
        "value": np.round(rng.uniform(0, 10, n), 3)})
    # null out every value in a few (user, day) cells entirely
    day = (pdf["ts"].astype("int64") // (86400 * 10**9))
    kill = {(u, d) for u, d in zip(pdf["user_id"], day)
            if (u * 31 + d) % 7 == 0}
    mask = [(u, d) in kill for u, d in zip(pdf["user_id"], day)]
    pdf.loc[mask, "value"] = np.nan
    df = spark.createDataFrame(pdf)

    for fill in (None, "ffill"):
        got = (resample(df, "ts", "user_id", 86400, "value",
                        agg="sum", fill=fill)
               .toPandas()
               .sort_values(["user_id", "bucket_ts"])
               .reset_index(drop=True))
        for uid, g in got.groupby("user_id"):
            sub = pdf[pdf["user_id"] == uid].set_index("ts")
            # min_count=1 -> all-null bucket sums to NaN (Spark SUM
            # convention), not 0 (pandas default)
            exp = (sub["value"].resample("1D", origin="epoch")
                   .sum(min_count=1))
            exp = exp.loc[exp.first_valid_index():exp.last_valid_index()]
            # pandas keeps trailing/leading all-NaN days only inside the
            # observed span; resample() grids first->last EVENT day
            lo = sub.index.min().floor("1D")
            hi = sub.index.max().floor("1D")
            exp = exp.reindex(pd.date_range(lo, hi, freq="1D"))
            if fill == "ffill":
                exp = exp.ffill()
            g = g.set_index("bucket_ts")["sum_value"].sort_index()
            assert list(g.index) == list(exp.index)
            assert np.allclose(g.fillna(-1).to_numpy(),
                               exp.fillna(-1).to_numpy(), atol=1e-6)


def test_scd2_intervals_cover_and_chain(tsdf):
    from handyspark_spark.operators.timeseries import scd2_history
    df, pdf = tsdf
    got = (scd2_history(df, "user_id", "ts", ["state"],
                        tiebreak_col="event_id")
           .toPandas())
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("valid_from").reset_index(drop=True)
        # exactly one open interval (the current state)
        assert g["valid_to"].isna().sum() == 1
        assert pd.isna(g["valid_to"].iloc[-1])
        # intervals chain: valid_to == next valid_from
        nxt = g["valid_from"].iloc[1:].reset_index(drop=True)
        prev_to = g["valid_to"].iloc[:-1].reset_index(drop=True)
        assert (prev_to == nxt).all()
        # no two consecutive intervals share the same state
        assert (g["state"].shift() != g["state"]).iloc[1:].all()
        # replaying the log gives the same run-length states
        sub = pdf[pdf["user_id"] == uid].sort_values(["ts", "event_id"])
        runs = [s for s, prev in zip(sub["state"],
                                     sub["state"].shift())
                if s != prev or prev is None or pd.isna(prev)]
        runs = [sub["state"].iloc[0]] + [
            s for s, p in zip(sub["state"].iloc[1:],
                              sub["state"].iloc[:-1]) if s != p]
        assert list(g["state"]) == runs


def test_constraint_report_passes_and_fails(spark):
    from handyspark_spark.operators.quality import Check, constraint_report
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4, 4],
        "email": ["a@x.com", "b@y.org", None, "bad", "c@z.net"],
        "score": [0.1, 0.5, 0.9, 1.5, -0.2]})
    df = spark.createDataFrame(pdf)
    chk = (Check()
           .not_null("email", max_null_ratio=0.1)       # 0.2 > 0.1: fail
           .unique("id")                                 # dup 4: fail
           .in_range("score", 0, 1, max_violation_ratio=0.5)  # 0.4: pass
           .matches("email", r"^[^@]+@[^@]+\.[a-z]+$",
                    min_match_ratio=0.5)                 # 3/5=0.6: pass
           .min_rows(3))                                 # pass
    got = {(r.constraint, r.column): (r.metric, r.passed)
           for r in constraint_report(df, chk).collect()}
    assert got[("not_null", "email")] == (0.2, False)
    m, p = got[("unique", "id")]
    assert p is False and m > 0
    assert got[("in_range", "score")][1] is True
    assert got[("matches", "email")][1] is True
    assert got[("min_rows", "*")] == (5.0, True)


def test_constraint_report_single_job_for_row_constraints(spark):
    """All row-expressible constraints fuse into one aggregation —
    the physical plan has exactly one Aggregate chain over the input
    (unique checks excluded here)."""
    from pyspark.sql import functions as F

    from handyspark_spark.operators.quality import Check, constraint_report
    df = spark.range(100).withColumn("v", F.lit(0.5))
    chk = (Check().not_null("v").in_range("v", 0, 1)
           .isin("id", list(range(200))).min_rows(1))
    rep = constraint_report(df, chk)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    import re
    # one scan of the range source feeding one partial/final agg pair
    assert len(re.findall(r"Scan|Range", plan)) <= 3
    assert rep.count() == 4


def test_rolling_zscore_matches_pandas(spark, tables, pdf_tables):
    from pyspark.sql import functions as F
    from handyspark_spark.operators.timeseries import rolling_zscore
    ev = tables["events"]
    got = {r["event_id"]: (r["zscore"], r["is_anomaly"]) for r in
           rolling_zscore(ev, "ts", "user_id", "value", lookback=10,
                          min_points=3, threshold=2.0,
                          tiebreak_col="event_id")
           .select("event_id", "zscore", "is_anomaly").collect()}
    pdf = pdf_tables["events"].sort_values(["user_id", "ts", "event_id"])
    for _, g in pdf.groupby("user_id"):
        vals = g["value"].tolist()
        ids = g["event_id"].tolist()
        for i in range(len(vals)):
            window = vals[max(0, i - 10):i]
            z, flag = None, None
            if len(window) >= 3:
                import statistics
                m = statistics.fmean(window)
                s = statistics.stdev(window)
                if s > 0:
                    z = (vals[i] - m) / s
                    flag = abs(z) > 2.0
            gz, gf = got[ids[i]]
            if z is None:
                assert gz is None
            else:
                assert gz is not None and abs(gz - z) < 1e-9
                assert gf == flag
