"""Seeded differential fuzzing: randomly generated aggregation specs
executed on Spark (via the engine's plan builders) and DuckDB, compared
exactly. A miniature SQL-logic-test corpus the reference lacks."""
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from handyspark_spark.operators import agg as A

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
CAT_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

AGGS = {
    "sum": (lambda c: F.round(F.sum(F.col(c).cast("double")), 2),
            "ROUND(SUM(CAST({c} AS DOUBLE)), 2)"),
    "avg": (lambda c: F.round(F.mean(F.col(c).cast("double")), 4),
            "ROUND(AVG(CAST({c} AS DOUBLE)), 4)"),
    "min": (lambda c: F.min(c), "MIN({c})"),
    "max": (lambda c: F.max(c), "MAX({c})"),
    "cnt": (lambda c: F.count(F.lit(1)), "COUNT(*)"),
    "cntd": (lambda c: F.count_distinct(F.col(c)),
             "COUNT(DISTINCT {c})"),
    "med": (lambda c: F.round(A.percentile_expr(c, 0.5, exact=True), 4),
            "ROUND(quantile_cont({c}, 0.5), 4)"),
}

FILTERS = [
    (None, None),
    (lambda df: df.filter(F.col("l_quantity") > 25),
     "WHERE l_quantity > 25"),
    (lambda df: df.filter(F.col("l_returnflag") != "N"),
     "WHERE l_returnflag != 'N'"),
    (lambda df: df.filter(F.col("l_discount").between(0.02, 0.06)),
     "WHERE l_discount BETWEEN 0.02 AND 0.06"),
]


def _spec(rng):
    keys = rng.sample(CAT_COLS, rng.randint(0, 2))
    n_aggs = rng.randint(1, 3)
    aggs = [(f"a{i}", rng.choice(list(AGGS)), rng.choice(NUM_COLS))
            for i in range(n_aggs)]
    flt = rng.choice(FILTERS)
    return keys, aggs, flt


@pytest.mark.parametrize("seed", range(20))
def test_random_agg_matches_duckdb(tables, ddb, seed):
    rng = random.Random(1000 + seed)
    keys, aggs, (f_spark, f_sql) = _spec(rng)

    df = tables["lineitem"]
    if f_spark:
        df = f_spark(df)
    exprs = [AGGS[fn][0](col).alias(name) for name, fn, col in aggs]
    got = A.summary_plan(df, exprs, keys or None).toPandas()

    sel = ", ".join(
        ([*keys] if keys else [])
        + [AGGS[fn][1].format(c=col) + f" AS {name}"
           for name, fn, col in aggs])
    sql = f"SELECT {sel} FROM lineitem {f_sql or ''}"
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    exp = ddb.sql(sql).df()

    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    for frame in (got, exp):
        for c in frame.columns:
            if str(frame[c].dtype).startswith(("uint", "int", "Int")):
                frame[c] = frame[c].astype("int64")
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
