"""Value-level sf1+ oracle for ``jaccard_pairs`` — closes the one
ORACLE_SF1 skip (round-4 verdict item #1).

Why the standard oracle can't run at sf1: the all-pairs cross join is
O(n²) in documents, and even the Bayardo prefix-filtered form (the
queries.py oracle, fine at sf0.01) degenerates on this corpus at sf1 —
the synthetic vocabulary is tiny (~hundreds of tokens for 50k docs), so
even rarest-first prefixes contain tokens with df≈38k and the candidate
set is ~1e9 pairs (~80% of all pairs; measured 230s for the candidate
COUNT alone in DuckDB, before any verification).

The feasible exact oracle uses a THRESHOLD identity instead: for a pair
with Jaccard >= t, the symmetric difference d = |A∆B| satisfies
d <= (1-t)/t * |A∩B| <= (1-t)/t * max_n. With t = 0.95 and this
corpus's max distinct-token count (<= 37 < 2t/(1-t) = 38), d <= 1 —
every qualifying pair has EQUAL token sets (J = 1) or differs by
exactly one token (A ⊂ B, |B| = |A|+1, J = |A|/|B|). That reduces the
oracle to one equal-fingerprint self-join plus one drop-one-token
subset join — linear-ish in documents, independent of both the Spark
implementation and the prefix-filter theorem. The precondition is
ASSERTED against the data before the comparison, so a future corpus
with longer documents fails loudly instead of silently under-counting.

Also runs the engine-internal differential the verdict suggested:
``strategy='prefix'`` vs ``strategy='inverted'`` (two independent Spark
code paths) must agree exactly — on a deterministic 1-in-5 hash-sample,
because the uncapped inverted join is quadratic in docs-per-token and
this corpus's hottest tokens sit in ~76% of documents (full-sf1 run
lands a 1.4e9-row join in one token-keyed task; killed after 35 min).

Usage: python tools/verify_jaccard_sf1.py [SF_DIR] [--json OUT.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.95

ORACLE_SQL = r"""
WITH ts AS (
  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS t
  FROM documents
), fp AS (
  SELECT doc_id, array_to_string(t, chr(1)) AS f, len(t) AS n, t FROM ts
), eq AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0 AS jaccard
  FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
), drops AS (
  SELECT doc_id AS id_big, n AS nb,
         array_to_string(list_concat(t[1:j-1], t[j+1:len(t)]), chr(1)) AS f1
  FROM fp, UNNEST(range(1, n + 1)) AS u(j)
  WHERE (n - 1.0) / n >= 0.95
), sub AS (
  SELECT LEAST(a.doc_id, d.id_big) AS id_a,
         GREATEST(a.doc_id, d.id_big) AS id_b,
         ROUND(a.n * 1.0 / d.nb, 6) AS jaccard
  FROM fp a JOIN drops d ON a.f = d.f1 AND a.doc_id <> d.id_big
)
SELECT * FROM eq UNION ALL SELECT * FROM sub
"""


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[["id_a", "id_b", "jaccard"]].copy()
    pdf["id_a"] = pdf["id_a"].astype("int64")
    pdf["id_b"] = pdf["id_b"].astype("int64")
    pdf["jaccard"] = pdf["jaccard"].astype("float64").round(6)
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/sf1"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    max_n = con.sql("SELECT MAX(len(list_distinct(string_split(text,' '))))"
                    " FROM documents").fetchone()[0]
    bound = 2 * THRESHOLD / (1 - THRESHOLD)
    assert max_n < bound, (
        f"oracle precondition violated: max distinct tokens {max_n} >= "
        f"{bound:.0f}; the d<=1 identity no longer covers all pairs")

    t0 = time.time()
    oracle = norm(con.sql(ORACLE_SQL).df())
    t_oracle = time.time() - t0
    print(f"oracle: {len(oracle)} rows in {t_oracle:.1f}s "
          f"(max_n={max_n} < {bound:.0f})")

    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from handyspark_spark import queries as Q

    t0 = time.time()
    got = norm(Q.QUERIES["jaccard_pairs"](spark, sf_dir).toPandas())
    t_spark = time.time() - t0
    print(f"spark (driver query / prefix path): {len(got)} rows "
          f"in {t_spark:.1f}s")

    pd.testing.assert_frame_equal(got, oracle, check_dtype=False,
                                  check_exact=True)
    print("PASS jaccard_pairs value-level vs DuckDB d<=1 oracle")

    # engine-internal differential: the inverted path is an independent
    # implementation of the same exact semantics. Run it on a
    # deterministic 1-in-5 hash-sample of the corpus rather than the
    # whole thing: the UNCAPPED inverted join is quadratic in
    # docs-per-token, and on this corpus the top tokens appear in ~76%
    # of documents — at full sf1 that is a 1.4e9-row join landing in a
    # single token-keyed task (measured: >35 min single-threaded before
    # being killed; this is precisely the blowup ``max_token_df``
    # exists to prevent, and capping would change the scores). The
    # sample keeps the same data characteristics (clique depth, tiny
    # vocabulary, doc lengths) at 1/25 the join cost.
    from pyspark.sql import functions as F

    from handyspark_spark.pipeline.dedup import ngram_jaccard_pairs
    from handyspark_spark.sources.loader import load_table
    docs = load_table(spark, sf_dir, "documents").filter(
        F.pmod(F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                  1, 8), 16, 10).cast("bigint"),
               F.lit(5)) == 0)
    t0 = time.time()
    inv = norm(ngram_jaccard_pairs(docs, threshold=THRESHOLD,
                                   strategy="inverted")
               .select("id_a", "id_b",
                       F.round("jaccard", 6).alias("jaccard")).toPandas())
    pre = norm(ngram_jaccard_pairs(docs, threshold=THRESHOLD,
                                   strategy="prefix")
               .select("id_a", "id_b",
                       F.round("jaccard", 6).alias("jaccard")).toPandas())
    t_inv = time.time() - t0
    print(f"differential sample: inverted {len(inv)} rows vs prefix "
          f"{len(pre)} rows in {t_inv:.1f}s")
    pd.testing.assert_frame_equal(pre, inv, check_dtype=False,
                                  check_exact=True)
    print("PASS prefix vs inverted engine-internal differential "
          "(1-in-5 hash-sample)")

    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "query": "jaccard_pairs",
                       "status": "pass", "rows": int(len(got)),
                       "oracle": "duckdb symmetric-difference<=1 "
                                 "(threshold identity), value-exact",
                       "differential": "prefix vs inverted strategies "
                                       "on a 1-in-5 hash-sample, "
                                       "value-exact",
                       "max_distinct_tokens": int(max_n),
                       "sec_oracle": round(t_oracle, 1),
                       "sec_spark_prefix": round(t_spark, 1),
                       "sec_spark_inverted": round(t_inv, 1)}, f, indent=1)
        print(f"wrote {json_out}")
    spark.stop()


if __name__ == "__main__":
    main()
