"""Training-data pipeline operators (beyond-reference surface)."""
from .dedup import (connected_components, decontaminate,
                    lsh_bucket_state, lsh_incremental_matches,
                    decontaminate_bloom, dedup_keep_best,
                    minhash_lsh_components, minhash_lsh_star_edges,
                    embedding_neardup_pairs, exact_duplicates,
                    fingerprint_duplicates, minhash_lsh_groups,
                    minhash_lsh_pairs, minhash_signature_arrays,
                    minhash_signatures, ngram_jaccard_pairs,
                    simhash_fingerprints, simhash_neardup_pairs)
from .sample import (balanced_sample, hash_sample, hash_unit, kfold_assign,
                     mix_sources,
                     split_assign, stratified_sample,
                     token_budget_sample, weighted_sample)
from .ir import (bm25_topk, pmi_collocations, term_frequencies, tfidf,
                 top_ngrams, unigram_logprob)
from .similarity import (brute_force_topk, ivf_topk, label_centroids,
                         lsh_neardup_pairs, neardup_pairs_blas,
                         pq_codebooks, pq_encode, pq_topk,
                         quantize_embeddings)
from .text import (analyze, chunk, fingerprint, lang_id, normalize_text,
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
]
