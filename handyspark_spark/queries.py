"""Driver-facing query catalog: every implemented operator exposed as a
(spark_query, oracle_sql) pair over the TESTDATA tables.

Conventions (driver contract, see __spark_entry__.py):
- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased IDENTICALLY in Spark and SQL;
- floating aggregates are rounded on both sides so IEEE accumulation-order
  noise cannot flip the driver's value hash;
- approximate algorithms (GK percentile, HLL) are exercised with their
  ``exact=`` switch here — approx variants are covered by pytest
  tolerance tests instead (SURVEY.md §6 approach).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.frame import HandyFrame, toHandy
from .operators import agg as A
from .operators.strata import Bucket
from .sources.loader import load_table

QUERIES = {}
ORACLE = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation core (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

@query("value_counts", """
SELECT l_returnflag, COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag
""")
def q_value_counts(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return (A.value_counts_plan(df, ["l_returnflag"])
            .withColumnRenamed("count", "cnt"))


@query("agg_moments", """
SELECT l_returnflag,
       ROUND(AVG(l_extendedprice), 2) AS mean_price,
       MIN(l_extendedprice)           AS min_price,
       MAX(l_extendedprice)           AS max_price,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
       COUNT(*)                       AS cnt
FROM lineitem GROUP BY l_returnflag
""")
def q_agg_moments(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return A.summary_plan(df, [
        F.round(F.mean("l_extendedprice"), 2).alias("mean_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.stddev("l_extendedprice"), 2).alias("std_price"),
        F.count(F.lit(1)).alias("cnt"),
    ], ["l_returnflag"])


@query("percentiles_exact", """
SELECT ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q1_price,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS med_price,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q3_price,
       ROUND(quantile_cont(l_quantity, 0.50), 4)      AS med_qty
FROM lineitem
""")
def q_percentiles_exact(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return A.summary_plan(df, [
        F.round(A.percentile_expr("l_extendedprice", 0.25, exact=True), 4)
         .alias("q1_price"),
        F.round(A.percentile_expr("l_extendedprice", 0.50, exact=True), 4)
         .alias("med_price"),
        F.round(A.percentile_expr("l_extendedprice", 0.75, exact=True), 4)
         .alias("q3_price"),
        F.round(A.percentile_expr("l_quantity", 0.50, exact=True), 4)
         .alias("med_qty"),
    ])


@query("nunique_exact", """
SELECT COUNT(DISTINCT l_orderkey)   AS nu_orderkey,
       COUNT(DISTINCT l_partkey)    AS nu_partkey,
       COUNT(DISTINCT l_returnflag) AS nu_returnflag
FROM lineitem
""")
def q_nunique_exact(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return A.summary_plan(df, [
        F.count_distinct(F.col("l_orderkey")).alias("nu_orderkey"),
        F.count_distinct(F.col("l_partkey")).alias("nu_partkey"),
        F.count_distinct(F.col("l_returnflag")).alias("nu_returnflag"),
    ])


@query("mode", """
SELECT o_orderpriority AS mode_priority FROM (
  SELECT o_orderpriority,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_orderpriority ASC)
           AS rn
  FROM orders GROUP BY o_orderpriority
) WHERE rn = 1
""")
def q_mode(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    return (A.mode_plan(df, "o_orderpriority")
            .withColumnRenamed("o_orderpriority", "mode_priority"))


@query("isnull_counts", """
SELECT CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_qty,
       CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_flag,
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_ship
FROM lineitem
""")
def q_isnull_counts(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    out = A.isnull_plan(df, ["l_quantity", "l_returnflag", "l_shipdate"])
    return out.select(F.col("l_quantity").alias("null_qty"),
                      F.col("l_returnflag").alias("null_flag"),
                      F.col("l_shipdate").alias("null_ship"))


@query("entropy", """
WITH c AS (
  SELECT l_returnflag AS v, COUNT(*) AS n FROM lineitem GROUP BY 1
), tot AS (SELECT SUM(n) AS n FROM c)
SELECT 'l_returnflag' AS colname,
       ROUND(SUM(-(c.n * 1.0 / tot.n) * LOG2(c.n * 1.0 / tot.n)), 6)
         AS entropy
FROM c, tot
""")
def q_entropy(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    out = A.entropy_plan(df, ["l_returnflag"])
    return out.select("colname", F.round("entropy", 6).alias("entropy"))


@query("mutual_info", """
WITH j AS (
  SELECT l_returnflag x, l_linestatus y, COUNT(*) nxy
  FROM lineitem GROUP BY 1, 2
), mx AS (SELECT l_returnflag x, COUNT(*) nx FROM lineitem GROUP BY 1),
   my AS (SELECT l_linestatus y, COUNT(*) ny FROM lineitem GROUP BY 1),
   t AS (SELECT COUNT(*) n FROM lineitem)
SELECT ROUND(SUM((nxy * 1.0 / n) * LOG2(nxy * 1.0 * n / (nx * 1.0 * ny))), 6)
         AS mutual_info
FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t
""")
def q_mutual_info(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    out = A.mutual_info_plan(df, "l_returnflag", "l_linestatus")
    return out.select(F.round("mutual_info", 6).alias("mutual_info"))


@query("corr_matrix", """
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount',
       ROUND(CORR(l_quantity, l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       ROUND(CORR(l_extendedprice, l_discount), 6) FROM lineitem
""")
def q_corr_matrix(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    out = A.corr_plan(df, ["l_quantity", "l_extendedprice", "l_discount"])
    return (out.filter(F.col("col_x") != F.col("col_y"))
               .select("col_x", "col_y",
                       F.round("corr", 6).alias("corr")))


# ---------------------------------------------------------------------------
# Stratified aggregation (SURVEY.md §2.6) — single grouped job
# ---------------------------------------------------------------------------

@query("strat_mean", """
SELECT l_returnflag, l_linestatus,
       ROUND(AVG(l_extendedprice), 2) AS mean_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def q_strat_mean(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return A.summary_plan(
        df, [F.round(F.mean("l_extendedprice"), 2).alias("mean_price")],
        ["l_returnflag", "l_linestatus"])


@query("strat_median", """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
FROM lineitem GROUP BY l_returnflag
""")
def q_strat_median(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return A.summary_plan(
        df, [F.round(A.percentile_expr("l_extendedprice", 0.5, exact=True), 4)
             .alias("med_price")], ["l_returnflag"])


@query("strat_value_counts", """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def q_strat_value_counts(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return (A.value_counts_plan(df, ["l_linestatus"], ["l_returnflag"])
            .withColumnRenamed("count", "cnt"))


@query("bucket_counts", """
WITH mm AS (
  SELECT MIN(o_totalprice) mn, MAX(o_totalprice) mx FROM orders
)
SELECT CAST(LEAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 5)), 4) AS INT)
         AS bucket,
       COUNT(*) AS cnt
FROM orders, mm GROUP BY 1
""")
def q_bucket_counts(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    b = Bucket("o_totalprice", 5)
    b._fit(df)
    return (df.withColumn("bucket", b._col())
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# Fitted transforms: fill / fence (SURVEY.md §2.2, §3.4)
# ---------------------------------------------------------------------------

@query("fill_mean", """
WITH src AS (
  SELECT l_returnflag, NULLIF(l_discount, 0.0) AS d FROM lineitem
), m AS (SELECT AVG(d) AS mu FROM src)
SELECT l_returnflag,
       ROUND(SUM(COALESCE(d, mu)), 2) AS sum_disc,
       COUNT(*) AS cnt
FROM src, m GROUP BY l_returnflag
""")
def q_fill_mean(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    hdf = toHandy(df.select(
        "l_returnflag",
        F.when(F.col("l_discount") == 0.0, None)
         .otherwise(F.col("l_discount")).alias("d")))
    filled = hdf.fill(continuous=["d"], strategy="mean")
    return A.summary_plan(filled._df, [
        F.round(F.sum("d"), 2).alias("sum_disc"),
        F.count(F.lit(1)).alias("cnt")], ["l_returnflag"])


@query("fence_sum", """
WITH q AS (
  SELECT quantile_cont(l_extendedprice, 0.25) q1,
         quantile_cont(l_extendedprice, 0.75) q3
  FROM lineitem
)
SELECT l_returnflag,
       ROUND(SUM(GREATEST(q1 - 1.5 * (q3 - q1),
                 LEAST(q3 + 1.5 * (q3 - q1), l_extendedprice))), 2)
         AS sum_fenced
FROM lineitem, q GROUP BY l_returnflag
""")
def q_fence_sum(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    fenced = toHandy(df).fence(["l_extendedprice"], exact=True)
    return A.summary_plan(fenced._df, [
        F.round(F.sum("l_extendedprice"), 2).alias("sum_fenced")],
        ["l_returnflag"])


@query("outliers_tukey", """
WITH q AS (
  SELECT quantile_cont(l_extendedprice, 0.25) q1,
         quantile_cont(l_extendedprice, 0.75) q3
  FROM lineitem
)
SELECT CAST(SUM(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1)
                       OR l_extendedprice > q3 + 1.5 * (q3 - q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM lineitem, q
""")
def q_outliers_tukey(spark, sf_dir):
    from .operators.fill import fit_fence_values
    df = _t(spark, sf_dir, "lineitem")
    lf, uf = fit_fence_values(df, ["l_extendedprice"],
                              exact=True)[0]["l_extendedprice"]
    return df.agg(F.sum(((F.col("l_extendedprice") < F.lit(lf)) |
                         (F.col("l_extendedprice") > F.lit(uf)))
                        .cast("long")).alias("n_outliers"))


# ---------------------------------------------------------------------------
# Scalar function surface: .str / .dt / assign (SURVEY.md §2.7-2.8)
# ---------------------------------------------------------------------------

@query("str_ops", """
SELECT p_partkey,
       UPPER(p_name)  AS up_name,
       LENGTH(p_name) AS name_len,
       CONTAINS(p_name, 'a') AS has_a,
       SUBSTRING(p_name, 1, 5) AS name5
FROM part
""")
def q_str_ops(spark, sf_dir):
    hdf = toHandy(_t(spark, sf_dir, "part"))
    s = hdf.pandas["p_name"].str
    out = hdf.assign(up_name=s.upper(),
                     name_len=s.len(),
                     has_a=s.contains("a", regex=False),
                     name5=s.slice(0, 5))
    return out.select("p_partkey", "up_name", "name_len", "has_a", "name5")._df


@query("dt_ops", """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT)    AS yr,
       CAST(MONTH(o_orderdate) AS INT)   AS mo,
       CAST(DAY(o_orderdate) AS INT)     AS dom,
       CAST(QUARTER(o_orderdate) AS INT) AS qtr,
       CAST((DAYOFWEEK(o_orderdate) + 6) % 7 AS INT) AS dow,
       CAST(WEEKOFYEAR(o_orderdate) AS INT) AS woy
FROM orders
""")
def q_dt_ops(spark, sf_dir):
    hdf = toHandy(_t(spark, sf_dir, "orders"))
    d = hdf.pandas["o_orderdate"].dt
    out = hdf.assign(yr=d.year, mo=d.month, dom=d.day, qtr=d.quarter,
                     dow=d.dayofweek, woy=d.weekofyear)
    return out.select("o_orderkey", "yr", "mo", "dom", "qtr", "dow",
                      "woy")._df


@query("assign_udf", """
SELECT l_returnflag, ROUND(SUM(LN(1 + l_extendedprice)), 4) AS sum_log
FROM lineitem GROUP BY l_returnflag
""")
def q_assign_udf(spark, sf_dir):
    import numpy as np
    hdf = toHandy(_t(spark, sf_dir, "lineitem"))
    out = hdf.assign(
        logp=lambda l_extendedprice: np.log1p(l_extendedprice))
    return A.summary_plan(out._df, [
        F.round(F.sum("logp"), 4).alias("sum_log")], ["l_returnflag"])


# ---------------------------------------------------------------------------
# TPC-H-style relational flagship
# ---------------------------------------------------------------------------

@query("tpch_q1", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                 AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)            AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       ROUND(AVG(l_quantity), 4)                 AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)            AS avg_price,
       ROUND(AVG(l_discount), 6)                 AS avg_disc,
       COUNT(*)                                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_tpch_q1(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return A.summary_plan(
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00")
                  .cast("timestamp")),
        [F.round(F.sum(F.col("l_quantity").cast("double")), 2).alias("sum_qty"),
         F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
         F.round(F.sum(disc), 2).alias("sum_disc_price"),
         F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
         F.round(F.mean(F.col("l_quantity").cast("double")), 4)
          .alias("avg_qty"),
         F.round(F.mean("l_extendedprice"), 4).alias("avg_price"),
         F.round(F.mean("l_discount"), 6).alias("avg_disc"),
         F.count(F.lit(1)).alias("count_order")],
        ["l_returnflag", "l_linestatus"])
