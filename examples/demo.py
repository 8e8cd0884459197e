"""Runnable tour of handyspark_spark — every major surface in one script.

    python examples/demo.py [sf_dir]     (default /root/testdata/sf0.001)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import handyspark_spark  # noqa: F401  (installs DataFrame.toHandy)
from handyspark_spark import Bucket, Quantile
from handyspark_spark.sources.loader import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .appName("handyspark_spark-demo")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    hdf = li.toHandy()

    print("== EDA core ==")
    print("median price:", hdf.cols["l_extendedprice"].median())
    print("nunique:\n", hdf.cols[["l_orderkey", "l_returnflag"]].nunique())
    print("value_counts:\n", hdf.cols["l_returnflag"].value_counts())
    print("corr:\n", hdf.cols[["l_quantity", "l_extendedprice"]].corr())

    print("\n== Stratification (one grouped job) ==")
    print(hdf.stratify(["l_returnflag", Bucket("l_extendedprice", 3)])
          .cols["l_quantity"].mean())

    print("\n== Fitted transforms -> serializable Transformer ==")
    with_nulls = hdf.assign(
        d=F.when(F.col("l_discount") == 0.0, None)
           .otherwise(F.col("l_discount")))
    filled = with_nulls.stratify(["l_returnflag"]).fill(
        continuous=["d"], strategy="mean")
    print("fitted stats:", filled.statistics_)
    imputer = filled.transformers.imputer()   # save()/load()-able
    print("imputer params:", imputer.getStatsDict())

    print("\n== UDF surface + accessors ==")
    from handyspark_spark.functions.transform import ret
    part = load_table(spark, sf_dir, "part").toHandy()
    out = part.assign(
        up=part.pandas["p_name"].str.upper(),
        # p_partkey is bigint; without the annotation the inferred return
        # type would be bigint too (reference rule: first arg's dtype)
        logkey=ret("double")(lambda p_partkey: np.log1p(p_partkey)))
    print(out.cols[["up", "logkey"]][:3])

    print("\n== Ordered windows (reference blacklist, done right) ==")
    orders = load_table(spark, sf_dir, "orders").toHandy()
    s = orders.ordered(by=["o_orderdate", "o_orderkey"],
                       partition="o_custkey")["o_totalprice"]
    print(orders.assign(cum=s.cumsum(), d=s.diff())
          .cols[["o_custkey", "cum", "d"]][:5])

    print("\n== Metrics (no JVM bridge) ==")
    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.col("embedding")[0].cast("double").alias("score"),
        (F.col("label") >= 5).cast("double").alias("label"))
    m = scored.toHandy().metrics("score", "label")
    print("AUC:", round(m.areaUnderROC, 4))
    print(m.confusionMatrix(0.0))

    print("\n== Training-data pipeline ==")
    docs = load_table(spark, sf_dir, "documents")
    from handyspark_spark.pipeline import text as TX
    from handyspark_spark.pipeline.dedup import (fingerprint_duplicates,
                                                 minhash_lsh_groups)
    from handyspark_spark.pipeline.similarity import brute_force_topk
    print("text stats:", TX.analyze(docs).select(
        "doc_id", "n_tokens", "quality", "lang_pred").limit(3).collect())
    print("dup groups:", fingerprint_duplicates(docs).count())
    print("lsh clusters:",
          minhash_lsh_groups(docs).filter("doc_id != cluster_id").count(),
          "docs clustered into earlier ids")
    from handyspark_spark.pipeline.dedup import (connected_components,
                                                 minhash_lsh_pairs)
    from handyspark_spark.pipeline.dedup import minhash_lsh_star_edges
    comp = connected_components(
        minhash_lsh_star_edges(docs, max_bucket_size=300))
    print("exact components:",
          comp.select("component").distinct().count())
    from handyspark_spark.pipeline.sample import split_assign
    from handyspark_spark.pipeline.text import chunk
    print("chunks:", chunk(docs, size=32, overlap=8).count())
    print("splits:", split_assign(docs, "doc_id").groupBy("split")
          .count().collect())
    print("ann:", brute_force_topk(
        emb, emb.filter("vec_id < 2"), k=3).collect())
    from handyspark_spark.pipeline.dedup import decontaminate
    from handyspark_spark.pipeline.text import (repetition_ratio,
                                                stop_tokens)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    print("decontaminated:", decontaminate(docs, bench).count(),
          "of", docs.count())
    print("high repetition docs:",
          docs.filter(repetition_ratio("text") > 0.5).count())
    print("corpus stop tokens:",
          [r.tok for r in stop_tokens(docs, max_df_frac=0.5).collect()][:8])
    from handyspark_spark.pipeline.ir import bm25_topk, tfidf, top_ngrams
    from handyspark_spark.pipeline.text import pack_sequences
    print("tfidf sample:", tfidf(docs).orderBy("doc_id", "tok")
          .limit(2).collect())
    print("bm25 top-3:", bm25_topk(docs, ["hash", "join"], k=3).collect())
    print("top bigrams:", [r.ngram for r in
                           top_ngrams(docs, n=2, k=3).collect()])
    packed = pack_sequences(docs, seq_len=256)
    print("packed sequences:",
          packed.select("seq_id").distinct().count(),
          "x256-token sequences from", docs.count(), "docs")

    print("\n== Stratified plot grid (shared limits, no render) ==")
    grid = (hdf.stratify(["l_returnflag"])
            .cols["l_extendedprice"].hist(bins=5, grid=True))
    print("grid shape:", grid.shape, "xlim:", grid.xlim,
          "panels:", [p.title for p in grid.panels])

    print("\n== Event-time windows ==")
    from handyspark_spark.streaming.windows import (session_counts,
                                                    stream_join, tumbling)
    ev = load_table(spark, sf_dir, "events")
    print(tumbling(ev, "ts", "1 hour").limit(3).collect())
    print(session_counts(ev, "ts", "user_id", 1800).limit(3).collect())
    clicks = ev.filter("event_type = 'click'") \
               .select(F.col("user_id").alias("uid"), "ts", "event_id")
    views = ev.filter("event_type = 'view'") \
              .select(F.col("user_id").alias("uid"), "ts",
                      F.col("value").alias("v"))
    print("click->view band joins:",
          stream_join(clicks, views, ["uid"], "ts", "ts",
                      tolerance="10 minutes").count())

    print("\n== Round-3: budgeted/weighted sampling + keep-best dedup ==")
    from handyspark_spark.pipeline.sample import (token_budget_sample,
                                                  weighted_sample)
    from handyspark_spark.pipeline.text import token_count
    docs_tok = docs.withColumn("n_tok", token_count("text"))
    capped = token_budget_sample(docs_tok, "doc_id", "n_tok", 2000,
                                 by="source")
    print("token-budget sample:", capped.count(), "docs within budget")
    ws = weighted_sample(docs_tok, "doc_id", "n_tok", 10)
    print("weighted sample mean tokens:",
          round(ws.agg(F.avg("n_tok")).first()[0], 1), "vs corpus",
          round(docs_tok.agg(F.avg("n_tok")).first()[0], 1))
    from handyspark_spark.pipeline.dedup import (dedup_keep_best,
                                                 decontaminate_bloom)
    kept = dedup_keep_best(docs, max_bucket_size=None)
    print("keep-best dedup:", docs.count(), "->", kept.count(), "docs")
    bench_docs = docs.filter(F.col("doc_id") % 17 == 0)
    clean = decontaminate_bloom(docs, bench_docs, m_bits=1 << 18, k=5)
    print("bloom decontaminate:", clean.count(), "clean docs")

    print("\n== Round-3: PQ search + calibration + real image decode ==")
    from handyspark_spark.pipeline.similarity import pq_topk
    emb = load_table(spark, sf_dir, "embeddings")
    q3 = emb.filter(F.col("vec_id") % 100 == 0)
    pq = pq_topk(emb, q3, k=3, m=16, nbits=4, rerank=25)
    print("PQ reranked top-3 sample:", pq.limit(3).collect())
    from handyspark_spark.ml.evaluation import (brier_score,
                                                calibration_bins)
    prob = F.lit(1.0) / (F.lit(1.0) +
                         F.exp(-3.0 * F.col("embedding")[0].cast("double")))
    scored = emb.select(prob.alias("score"),
                        (F.col("label") >= 5).cast("double").alias("label"))
    print("brier:", brier_score(scored).first()["brier"])
    print("calibration bins:", calibration_bins(scored, n_bins=5)
          .orderBy("bin").collect())
    from handyspark_spark.pipeline.multimodal import (attach_bmp_media,
                                                      image_stats)
    media = attach_bmp_media(docs.limit(20), "doc_id", "text", 8, 8)
    print("decoded image stats:", image_stats(media).limit(2).collect())

    print("\n== Round-4: funnel, SemDeDup, DSIR, drift, skew ==")
    from handyspark_spark.pipeline import (deterministic_shuffle,
                                           dsir_weights, pretrain_funnel,
                                           semdedup_drops,
                                           temperature_mix_rates)
    print("pretraining funnel:",
          pretrain_funnel(docs, bands=2).orderBy("stage").collect())
    print("semdedup drops:",
          semdedup_drops(emb, threshold=0.4).count(), "vectors pruned")
    target = docs.filter(F.col("doc_id") % 37 == 0)
    print("DSIR top target-like doc:",
          dsir_weights(docs, target)
          .orderBy(F.desc("log_weight")).first())
    from handyspark_spark.pipeline.text import token_count
    print("temperature mix (alpha=0.7):",
          temperature_mix_rates(docs, "source", token_count("text"))
          .orderBy("source").limit(3).collect())
    from handyspark_spark.pipeline.drift import drift_report
    ev = load_table(spark, sf_dir, "events")
    worst = (drift_report(ev, F.date_format("ts", "yyyy-MM-dd"),
                          "event_type")
             .orderBy(F.desc("js_divergence")).first())
    print("worst day-over-day drift:", worst)
    from handyspark_spark.operators.skew import skew_report
    print("event-type skew:", skew_report(ev, "event_type", top=3)
          .collect())
    print("epoch-0 shuffle head:",
          [r["doc_id"] for r in
           deterministic_shuffle(docs, "doc_id").limit(5).collect()])

    spark.stop()


if __name__ == "__main__":
    main()
