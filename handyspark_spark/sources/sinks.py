"""Lake-layout sinks: partitioned / bucketed / size-targeted parquet
writes and Z-order clustering.

The reference defines no sinks (SURVEY.md §2.1 — ingestion/egress is
``spark.read``/``spark.write``); these helpers encode the layout
decisions that actually matter at 100 TB, where "just write it" produces
either small-file storms or unprunable monoliths:

- ``write_partitioned``: hive-style partition dirs + in-file sort so
  parquet row-group min/max stats prune within each partition;
- ``write_bucketed``: pre-shuffled bucket layout — joins/aggs on the
  bucket key skip their exchange entirely at read time;
- ``compact_to_target``: choose the output file count from measured
  bytes, not guesses (AQE coalesces shuffles, not final writes);
- ``zorder_by``: multi-dimensional clustering — interleave the bits of
  several sort keys so ONE sort order serves range predicates on ANY of
  them. The z-value is a pure native expression (no UDF); write with
  ``repartitionByRange(zvalue) + sortWithinPartitions(zvalue)`` and
  every file covers a small hyper-rectangle of the key space.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["write_partitioned", "write_bucketed", "compact_to_target",
           "zorder_value", "zorder_by"]


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      sort_cols: list[str] | None = None,
                      mode: str = "overwrite",
                      files_per_partition: int = 1) -> None:
    """Hive-partitioned parquet write with intra-file ordering.

    One ``repartition(partition_cols [, salt])`` so each output dir is
    written by few tasks (no small-file storm: without it EVERY task
    writes a file into EVERY partition dir it holds rows for), then
    ``sortWithinPartitions`` so row-group stats are tight on the sort
    key — the scan-side pruning column."""
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        parts = parts + [(F.spark_partition_id() % files_per_partition)]
    out = df.repartition(*parts)
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table (``bucketBy`` requires ``saveAsTable``).
    Reads of two tables bucketed the same way join WITHOUT an exchange —
    the 100 TB answer to repeated co-located joins on a fact key."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def compact_to_target(df: DataFrame, path: str,
                      target_file_bytes: int = 128 * 1024 * 1024,
                      sample_rows: int = 10_000,
                      mode: str = "overwrite") -> int:
    """Write ``df`` as ~``target_file_bytes`` parquet files.

    File count is derived from MEASURED data: a bounded sample is
    Arrow-encoded to estimate bytes/row (compressed parquet runs ~2x
    smaller than Arrow IPC; factored in), times the exact row count.
    Returns the chosen file count."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = df.count()
    if n == 0:
        df.coalesce(1).write.mode(mode).parquet(path)
        return 1
    pdf = df.limit(min(sample_rows, n)).toPandas()
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf), buf, compression="snappy")
    bytes_per_row = max(buf.getbuffer().nbytes / max(len(pdf), 1), 1.0)
    files = max(1, round(n * bytes_per_row / target_file_bytes))
    df.repartition(files).write.mode(mode).parquet(path)
    return files


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column. Native expression only — per column c_i, bit b lands at
    position ``b * k + i`` (k = number of columns):

        z = Σ_i Σ_b ((c_i >> b) & 1) << (b·k + i)

    Columns must already be non-negative integers in [0, 2^bits); rank
    or bucketize continuous values first (e.g. ``F.ntile`` or a
    ``Bucket`` projection). k·bits must fit a long (k·bits ≤ 62)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        ci = c.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(ci, b).bitwiseAND(F.lit(1)),
                b * k + i)
    return z


def zorder_by(df: DataFrame, cols: list[str], bits: int = 16,
              num_files: int | None = None) -> DataFrame:
    """Cluster ``df`` for multi-dimensional pruning: compute the z-value,
    range-partition on it (ONE exchange; each task gets a contiguous
    z-range = a small hyper-rectangle of the key space), sort within.
    Write the result as-is; drop ``_zvalue`` if the schema must stay
    clean (kept by default so audits can verify clustering)."""
    out = df.withColumn("_zvalue", zorder_value(cols, bits))
    n = num_files or int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    return (out.repartitionByRange(n, "_zvalue")
               .sortWithinPartitions("_zvalue"))
