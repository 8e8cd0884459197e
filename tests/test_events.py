"""Differential tests for operators/events.py and ml/pca.py."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ev(spark):
    rng = np.random.RandomState(3)
    n = 400
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.randint(0, 12, n),
        "ts": base + pd.to_timedelta(
            np.sort(rng.randint(0, 90 * 86400, n)), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase"], n),
        "value": np.round(rng.uniform(0, 100, n), 2)})
    return spark.createDataFrame(pdf), pdf


def test_trailing_features_match_pandas(ev):
    from handyspark_spark.operators.events import trailing_features
    df, pdf = ev
    got = (trailing_features(df, "ts", "user_id", "value",
                             windows_seconds=[3600])
           .select("event_id", "f_cnt_3600s", "f_sum_3600s")
           .toPandas().set_index("event_id").sort_index())
    exp_cnt, exp_sum = {}, {}
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        for _, r in g.iterrows():
            lo = r["ts"] - pd.Timedelta(seconds=3600) \
                + pd.Timedelta(microseconds=1)
            win = g[(g["ts"] >= lo) & (g["ts"] <= r["ts"])]
            exp_cnt[r["event_id"]] = len(win)
            exp_sum[r["event_id"]] = round(win["value"].sum(), 6)
    assert got["f_cnt_3600s"].to_dict() == exp_cnt
    for k, v in exp_sum.items():
        assert abs(got["f_sum_3600s"][k] - v) < 1e-6


def test_trailing_features_never_see_future(ev):
    """Leakage check: a trailing window ending at the current row can
    never count more events than the entity has at or before that ts."""
    from handyspark_spark.operators.events import trailing_features
    df, pdf = ev
    got = (trailing_features(df, "ts", "user_id", "value",
                             windows_seconds=[86400 * 365])
           .toPandas())
    # with a huge window the count equals "events so far" per user
    for _, g in got.groupby("user_id"):
        assert (g.sort_values("ts")["f_cnt_31536000s"].diff().dropna()
                >= 0).all()


def test_event_transitions_match_pandas(ev):
    from handyspark_spark.operators.events import event_transitions
    df, pdf = ev
    got = {(r.from_type, r.to_type): r.n for r in
           event_transitions(df, "ts", "user_id", "event_type",
                             tiebreak_col="event_id").collect()}
    exp = {}
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        for a, b in zip(g["event_type"], g["event_type"].iloc[1:]):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp


def test_cohort_retention_counts(ev):
    from handyspark_spark.operators.events import cohort_retention
    df, pdf = ev
    got = cohort_retention(df, "ts", "user_id").toPandas()
    # every user appears in exactly one cohort; cohort sizes at index 0
    # equal the number of users whose first event is in that month
    first = pdf.groupby("user_id")["ts"].min().dt.to_period("M")
    exp0 = first.value_counts()
    g0 = got[got["month_index"] == 0].set_index(
        got[got["month_index"] == 0]["cohort_month"].dt.to_period("M"))
    for per, n in exp0.items():
        assert g0.loc[per, "n_active"] == n


def test_pca_matches_numpy(spark):
    from handyspark_spark.ml.pca import covariance_plan, pca_fit, pca_project
    rng = np.random.RandomState(11)
    X = rng.randn(500, 4) @ rng.randn(4, 4) + rng.randn(4)
    pdf = pd.DataFrame(X, columns=["a", "b", "c", "d"])
    df = spark.createDataFrame(pdf)
    cols = ["a", "b", "c", "d"]

    cov = {(r.col_x, r.col_y): r.cov
           for r in covariance_plan(df, cols).collect()}
    C = np.cov(X, rowvar=False, ddof=1)
    for i, cx in enumerate(cols):
        for j in range(i, 4):
            assert abs(cov[(cx, cols[j])] - C[i, j]) < 1e-8

    model = pca_fit(df, cols)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1]
    np.testing.assert_allclose(model["explained_variance"], vals[order],
                               rtol=1e-8)
    got = (pca_project(df, cols, model, n_components=2)
           .select("pc0", "pc1").toPandas().to_numpy())
    W = vecs[:, order].T
    for r in range(4):
        m = np.argmax(np.abs(W[r]))
        if W[r, m] < 0:
            W[r] = -W[r]
    exp = (X - X.mean(axis=0)) @ W[:2].T
    # projection is order-insensitive row-wise here (same input order)
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(exp, axis=0),
                               rtol=1e-6, atol=1e-8)

    white = pca_project(df, cols, model, n_components=2, whiten=True)
    wvar = white.select("pc0", "pc1").toPandas().var(ddof=1)
    np.testing.assert_allclose(wvar, [1.0, 1.0], rtol=1e-6)


def test_pmi_identity_on_uniform_pairs(spark):
    """Independent adjacent tokens -> PMI ~ 0; a fixed collocation ->
    strongly positive PMI."""
    from handyspark_spark.pipeline.ir import pmi_collocations
    docs = [("new york " * 50).strip()] + ["a b " * 50] * 2
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "doc_id long, text string")
    got = {(r.tok_a, r.tok_b): r.pmi
           for r in pmi_collocations(df, min_count=5).collect()}
    assert got[("new", "york")] > 0.5
    assert ("york", "a") not in got or got[("york", "a")] < got[("new", "york")]


def test_unigram_logprob_ranks_repetitive_higher(spark):
    from handyspark_spark.pipeline.ir import unigram_logprob
    docs = [(0, "the the the the the the the the"),
            (1, "zephyr quixotic bungalow ephemeral rhubarb onyx vex jazz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    assert got[0] > got[1]
