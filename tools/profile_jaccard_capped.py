"""One-off profiler for jaccard_pairs_capped: times the pipeline's
stages separately (docs assembly, truncated prefix postings, candidate
join+distinct, full query) so optimization targets the real cost.
The inline stage bodies are a SNAPSHOT of the round-11 fused shape in
pipeline/dedup.py `_jaccard_prefix` (sizes ride the postings); if the
library shape changes, re-sync before trusting stage-level numbers —
the FULL-query timings always reflect the live library.
Usage: python tools/profile_jaccard_capped.py SF_DIR
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{label:38s} {time.monotonic() - t0:7.2f}s  {out}", flush=True)


def main():
    sf_dir = sys.argv[1]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.driver.memory", "40g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.files.maxPartitionBytes",
                     os.environ.get("HSQ_MAX_PART_BYTES", "128m"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from handyspark_spark.pipeline.dedup import (
        _cap_candidate_pairs, _smallest_k_per_key, _token_sets,
        ngram_jaccard_pairs)
    from handyspark_spark.sources.loader import load_table

    df = load_table(spark, sf_dir, "documents")
    threshold, cap = 0.95, 64

    ts = _token_sets(df, "text", "doc_id")
    inv = ts.select("_id", F.size("_toks").alias("_n"),
                    F.explode("_toks").alias("_tok"))
    dfc = inv.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    docs = (inv.join(dfc, "_tok")
            .groupBy("_id")
            .agg(F.array_sort(F.collect_list(F.struct("_df", "_tok")))
                 .alias("_st"),
                 F.first("_n").alias("_n"))
            .select("_id", "_n",
                    F.transform("_st", lambda s: s["_tok"]).alias("_kt")))
    p = F.greatest(
        F.size("_kt") - F.floor(F.lit(threshold) * F.col("_n"))
        .cast("int") + F.lit(1), F.lit(0))

    t("tokenize+sizes (noop)", lambda: ts.write.format("noop")
      .mode("overwrite").save())
    t("dfc (noop)", lambda: dfc.write.format("noop")
      .mode("overwrite").save())
    t("docs assembly (noop)", lambda: docs.write.format("noop")
      .mode("overwrite").save())

    pref0 = docs.select("_id", F.explode(F.slice("_kt", 1, p))
                        .alias("_tok"))
    t("prefix explode (noop)", lambda: pref0.write.format("noop")
      .mode("overwrite").save())
    pref1 = _smallest_k_per_key(pref0, ["_tok"], "_id", cap)
    t("+ smallest_k (noop)", lambda: pref1.write.format("noop")
      .mode("overwrite").save())

    pref2 = _cap_candidate_pairs(pref1, ["_tok"], 100_000_000,
                                 "profile", materialize=True)
    t("guard count (already timed above)", lambda: "")
    cand = (pref2.alias("pa")
            .join(pref2.alias("pb"),
                  (F.col("pa._tok") == F.col("pb._tok")) &
                  (F.col("pa._id") < F.col("pb._id")))
            .select(F.col("pa._id").alias("id_a"),
                    F.col("pb._id").alias("id_b")))
    t("cand join no-distinct (noop)", lambda: cand.write.format("noop")
      .mode("overwrite").save())
    t("cand join + distinct (noop)",
      lambda: cand.distinct().write.format("noop")
      .mode("overwrite").save())

    t("FULL query run1 (collect)", lambda: len(
        ngram_jaccard_pairs(df, threshold=threshold, strategy="prefix",
                            max_postings_per_token=cap).collect()))
    t("FULL query run2 (collect)", lambda: len(
        ngram_jaccard_pairs(df, threshold=threshold, strategy="prefix",
                            max_postings_per_token=cap).collect()))
    spark.stop()


if __name__ == "__main__":
    main()
