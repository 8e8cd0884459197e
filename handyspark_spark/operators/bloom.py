"""Distributed Bloom filter — approximate set membership at corpus scale.

The broadcast-anti-join decontamination path (pipeline/dedup.decontaminate)
assumes the benchmark key set fits in a broadcast (true for eval sets). When
the excluded set is itself huge — e.g. "everything already trained on", or a
blocklist of billions of URLs — the scalable shape is a Bloom filter:

- BUILD: each key sets k bit positions of an m-bit array. Distributed as a
  (word_index -> 64-bit word) table: explode k positions per key, one
  groupBy ``bit_or`` over word index. Shuffled bytes are ~k x |keys| ints,
  and the result is m/64 rows regardless of key count.
- PROBE: each candidate key checks its k positions against the word table
  (broadcast — m bits is sized to memory, e.g. 2^30 bits = 128 MiB for
  ~100M keys at 1% fp). All-k-set => "maybe member" (false positives
  possible), any-unset => DEFINITELY not a member (no false negatives).

The no-false-negative guarantee is what makes it a safe PREFILTER: probe
the corpus, then exact-verify only the (tiny) maybe-set with the normal
anti-join — semantics identical to the exact path, verified by the same
oracle (tests pin this and the fp rate).

Hashing: double hashing h1 + i*h2 (Kirsch-Mitzenmacher) over xxhash64 —
JVM-native, no UDFs anywhere.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe_col", "bloom_filter_maybe"]


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions in [0, m_bits) for a key — double hashing
    from two independent xxhash64 seeds. ``pmod`` keeps positions
    non-negative (hash values are signed 64-bit)."""
    # reduce mod m BEFORE combining: raw h1 + i*h2 overflows signed 64-bit
    # and ANSI mode (Spark 4 default) makes that an error, not a wrap
    h1 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(2)), F.lit(m_bits))
    return F.array(*[
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 24,
                k: int = 5) -> DataFrame:
    """Build the (word_idx, word) table: one explode + one ``bit_or``
    groupBy. Output has at most m_bits/64 rows (absent rows = all-zero
    words). Mergeable: union two builds and ``bit_or`` again."""
    pos = (keys.select(F.explode(_positions(F.col(key_col), m_bits, k))
                       .alias("_pos"))
           .select((F.col("_pos") / 64).cast("long").alias("word_idx"),
                   # SQL form: python F.shiftleft only takes literal bit
                   # counts, the expression form takes a column
                   F.expr("shiftleft(CAST(1 AS BIGINT), "
                          "CAST(pmod(_pos, 64) AS INT))").alias("_bit")))
    return (pos.groupBy("word_idx")
            .agg(F.bit_or("_bit").alias("word")))


def bloom_probe_col(df: DataFrame, key_col: str, bloom: DataFrame,
                    m_bits: int, k: int,
                    out_col: str = "_maybe") -> DataFrame:
    """Append boolean ``out_col``: True iff ALL k bit positions of the
    key are set (maybe-member), False iff provably absent. The word
    table joins broadcast on word_idx; a key contributes k probe rows,
    re-grouped on the key (duplicate input keys share one verdict).
    Bit tests use mask AND (no sign traps from the 64th bit).
    NULL keys were never hashed into the filter, so they verdict as
    False (not-a-member) rather than the NULL a null-keyed join would
    produce — downstream filters keep such rows in the clean set."""
    keys = df.select(F.col(key_col).alias("_bp_key")).distinct()
    exploded = (keys.select(
        "_bp_key",
        F.explode(_positions(F.col("_bp_key"), m_bits, k)).alias("_pos"))
        .select("_bp_key",
                (F.col("_pos") / 64).cast("long").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(pmod(_pos, 64) AS INT))").alias("_mask")))
    hit = (exploded.join(F.broadcast(bloom), "word_idx", "left")
           .select("_bp_key",
                   (F.coalesce(F.col("word"), F.lit(0))
                    .bitwiseAND(F.col("_mask")) != 0).alias("_set")))
    verdict = (hit.groupBy("_bp_key")
               .agg((F.count(F.lit(1)) ==
                     F.sum(F.col("_set").cast("int"))).alias(out_col))
               .select(F.col("_bp_key").alias(key_col), out_col))
    return (df.join(verdict, key_col, "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False))))


def bloom_filter_maybe(df: DataFrame, key_col: str, bloom: DataFrame,
                       m_bits: int, k: int) -> DataFrame:
    """Rows whose key MAY be in the built set (superset of the true
    matches — follow with an exact join to drop false positives)."""
    return (bloom_probe_col(df, key_col, bloom, m_bits, k)
            .filter(F.col("_maybe")).drop("_maybe"))
