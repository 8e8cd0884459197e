"""Cross-snapshot dataset diffing for training-corpus refresh audits.

When a corpus is re-crawled / re-filtered, the first question is "what
actually changed": which documents appeared, disappeared, or changed
content between snapshot A and snapshot B. The scalable shape is ONE
co-partitioned full-outer join on the snapshot key with map-side content
fingerprints — never a row-by-row text comparison and never a
driver-side loop.

At 100 TB the fingerprints should live in the snapshot manifests
(computed once at write time); ``snapshot_diff`` therefore accepts
either raw content columns (fingerprinted map-side here, md5 so any
engine reproduces them) or a precomputed fingerprint column, in which
case the diff never touches the content bytes at all — it joins two
slim (key, fp) projections.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_fingerprint(cols: list[str]) -> F.Column:
    """Engine-reproducible content fingerprint: md5 over the
    '\\x1f'-joined string forms (unit-separator keeps ("ab","c") and
    ("a","bc") distinct)."""
    return F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                       for c in cols]))


def snapshot_diff(a: DataFrame, b: DataFrame, key_col: str,
                  fingerprint_cols: list[str] | None = None,
                  fp_col: str | None = None,
                  out_col: str = "status") -> DataFrame:
    """Per-key diff of snapshot ``b`` against snapshot ``a``: one row
    per key present in either side with ``status`` in
    {'added','removed','changed','unchanged'} ('added' = in b only).

    Exactly one of ``fingerprint_cols`` (content columns, hashed
    map-side) or ``fp_col`` (a precomputed fingerprint column present
    in both frames) must be given. Plan: two narrow (key, fp)
    projections -> one full-outer sort-merge join co-partitioned on the
    key -> a pure status projection. No content bytes cross the
    exchange; the shuffle carries |A|+|B| fingerprint rows regardless
    of document size.
    """
    if (fingerprint_cols is None) == (fp_col is None):
        raise ValueError("give exactly one of fingerprint_cols / fp_col")
    if fingerprint_cols is not None:
        fp = content_fingerprint(fingerprint_cols)
        sa = a.select(F.col(key_col), fp.alias("_fp_a"))
        sb = b.select(F.col(key_col), fp.alias("_fp_b"))
    else:
        sa = a.select(F.col(key_col), F.col(fp_col).alias("_fp_a"))
        sb = b.select(F.col(key_col), F.col(fp_col).alias("_fp_b"))
    j = sa.join(sb, on=key_col, how="full_outer")
    status = (F.when(F.col("_fp_a").isNull(), F.lit("added"))
              .when(F.col("_fp_b").isNull(), F.lit("removed"))
              .when(F.col("_fp_a") != F.col("_fp_b"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return j.select(key_col, status.alias(out_col))


def diff_summary(diff: DataFrame, out_col: str = "status") -> DataFrame:
    """Roll the per-key diff up to per-status counts (<= 4 rows)."""
    return (diff.groupBy(out_col)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(out_col))
