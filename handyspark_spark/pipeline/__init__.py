"""Training-data pipeline operators (beyond-reference surface)."""
from .dedup import (connected_components, containment_pairs,
                    decontaminate,
                    lsh_bucket_state, lsh_incremental_matches,
                    decontaminate_bloom, dedup_keep_best,
                    minhash_lsh_components, minhash_lsh_star_edges,
                    embedding_neardup_pairs, exact_duplicates,
                    fingerprint_duplicates, minhash_lsh_groups,
                    minhash_lsh_pairs, minhash_signature_arrays,
                    minhash_signatures, ngram_jaccard_pairs,
                    ngram_contamination, passage_dedup,
                    simhash_fingerprints, simhash_neardup_pairs)
from .sample import (balanced_sample, deterministic_shuffle,
                     dsir_weights, hash_sample, hash_unit,
                     kfold_assign, mix_sources, split_assign,
                     stratified_sample, temperature_mix_rates,
                     token_budget_sample, weighted_sample)
from .ir import (bm25_topk, pmi_collocations, term_frequencies, tfidf,
                 top_ngrams, unigram_logprob)
from .similarity import (brute_force_topk, ivf_topk, label_centroids,
                         lsh_neardup_pairs, neardup_pairs_blas,
                         pq_codebooks, pq_encode, pq_topk,
                         quantize_embeddings, semdedup_drops,
                         semdedup_pairs)
from .drift import (drift_report, drift_report_from_hist,
                    slice_histograms)
from .text import (analyze, chunk, fingerprint, gopher_rules,
                   lang_id, let_bound, normalize_text,
                   pack_sequences, pii_counts, pii_redact, quality_score,
                   repetition_ratio, source_report, stop_tokens,
                   token_count, token_df_counts, top_ngram_fraction)

__all__ = [
    "exact_duplicates", "fingerprint_duplicates", "ngram_jaccard_pairs",
    "minhash_signatures", "minhash_signature_arrays", "minhash_lsh_pairs",
    "minhash_lsh_groups", "minhash_lsh_star_edges", "minhash_lsh_components",
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs", "connected_components", "decontaminate",
    "brute_force_topk", "neardup_pairs_blas", "lsh_neardup_pairs",
    "ivf_topk", "label_centroids",
    "term_frequencies", "tfidf", "bm25_topk", "top_ngrams",
    "pmi_collocations", "unigram_logprob",
    "analyze", "chunk", "fingerprint", "lang_id", "quality_score",
    "token_count", "repetition_ratio", "pii_counts", "token_df_counts",
    "stop_tokens", "pack_sequences", "source_report", "quantize_embeddings",
    "hash_unit", "hash_sample", "split_assign", "stratified_sample",
    "balanced_sample", "mix_sources",
    "decontaminate_bloom", "dedup_keep_best", "lsh_bucket_state",
    "kfold_assign", "lsh_incremental_matches", "token_budget_sample",
    "weighted_sample", "pq_codebooks", "pq_encode", "pq_topk",
    "normalize_text", "pii_redact", "top_ngram_fraction",
    "passage_dedup", "ngram_contamination", "semdedup_pairs",
    "semdedup_drops", "gopher_rules", "let_bound",
    "deterministic_shuffle", "dsir_weights", "temperature_mix_rates",
    "drift_report", "drift_report_from_hist", "slice_histograms",
    "containment_pairs",
]


def pretrain_funnel(df, text_col="text", id_col="doc_id",
                    bench=None, num_hashes=16, bands=4):
    """End-to-end pretraining data funnel — the composed pipeline a
    training run actually executes, returning per-stage survivor counts:

      raw -> quality gate (gopher_rules) -> exact dedup (first-copy
      keep) -> near-dup dedup (LSH groups, keep group min) ->
      benchmark decontamination (n-gram anti-join)

    Each stage consumes the previous stage's DataFrame lazily — Catalyst
    fuses the whole funnel into one job graph; counts come from ONE
    aggregation per stage over the shared lineage. At 100 TB the funnel
    is: one scan + the two dedup exchanges + a broadcast anti-join; the
    gates are free (projections on the same scan).

    Returns (stage, n_docs) with stages ordered raw/quality/exact/
    neardup/decontaminated."""
    from pyspark.sql import functions as F

    from .dedup import decontaminate, minhash_lsh_groups
    from .text import gopher_rules

    rules = gopher_rules(text_col)
    gated = df.filter(rules["pass"])

    from pyspark.sql import Window

    from ..core.cache import managed_persist
    w = Window.partitionBy(F.md5(F.col(text_col)))
    # persist the shared lineage: the exact-dedup window feeds the LSH
    # stage AND three downstream stage counts; uncached, the quality
    # gate + window re-execute per count (and the LSH signatures twice)
    exact = managed_persist(
        gated.withColumn("_first", F.min(id_col).over(w))
        .filter(F.col("_first") == F.col(id_col)).drop("_first"))

    groups = minhash_lsh_groups(exact, text_col=text_col, id_col=id_col,
                                num_hashes=num_hashes, bands=bands)
    keep = (groups.groupBy("cluster_id")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col))
    neardup = managed_persist(exact.join(keep, id_col, "left_semi"))

    if bench is None:
        bench = df.filter(F.col(id_col) % 37 == 0)
    clean = decontaminate(neardup, bench, text_col=text_col,
                          id_col=id_col, method="ngram")

    stages = [("1_raw", df), ("2_quality", gated), ("3_exact", exact),
              ("4_neardup", neardup), ("5_decontaminated", clean)]
    out = None
    for name, frame in stages:
        c = frame.agg(F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n_docs"))
        out = c if out is None else out.unionByName(c)
    return out
