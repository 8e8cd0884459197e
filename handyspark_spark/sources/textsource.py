"""Text-format ingestion: JSONL and CSV — the formats training corpora
actually arrive in (web dumps, API exports), with the two pieces of
plumbing real pipelines need: corrupt-record capture and explicit-schema
discipline.

Scale notes:
- Schema inference is an EXTRA FULL PASS over the data (and for JSON an
  extra parse); at 100 TB always pass ``schema``. The inference helpers
  here exist for interactive parity with the reference's
  ``inferSchema=True`` quick start (SURVEY.md §2.1) and sample the input
  when asked.
- ``.gz`` inputs decompress transparently but are NOT splittable — one
  task per file; repartition after read or prefer zstd-in-parquet.
- Corrupt records: PERMISSIVE mode keeps bad lines in a capture column
  instead of killing the job (DROPMALFORMED silently loses data — the
  wrong default for provenance-tracked corpora).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema=None,
               sample_fraction: float | None = None,
               keep_corrupt: bool = True) -> DataFrame:
    """Read JSON-lines. With ``schema`` (always, at scale): text scan +
    ``from_json`` projection — single pass, malformed lines land whole
    in ``_corrupt_record`` when ``keep_corrupt``. (Deliberately NOT the
    builtin columnNameOfCorruptRecord machinery: its internal column
    forbids corrupt-only queries [QUERY_ONLY_CORRUPT_RECORD_COLUMN], so
    ``corrupt_records(...).count()`` would fail; ``from_json`` has no
    such restriction and stays a plain projection.)
    Without ``schema``: inferred (extra pass; ``sample_fraction`` bounds
    it via ``samplingRatio``)."""
    if schema is not None:
        from pyspark.sql import types as T
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        raw = spark.read.text(path)
        # corrupt field declared INSIDE the from_json schema: PERMISSIVE
        # parse fills it with the raw line on malformed input (a bare
        # null struct is not distinguishable from an all-null record)
        # copy before adding the corrupt field — StructType.add mutates
        # in place, and the caller's schema object must not grow a
        # _corrupt_record column as a side effect
        pschema = schema if CORRUPT_COL in schema.fieldNames() \
            else T.StructType(list(schema.fields)).add(
                CORRUPT_COL, T.StringType())
        parsed = raw.select(F.from_json(
            "value", pschema,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": CORRUPT_COL}).alias("_r"))
        cols = [F.col(f"_r.{f.name}").alias(f.name) for f in schema
                if f.name != CORRUPT_COL]
        if keep_corrupt:
            cols.append(F.col(f"_r.{CORRUPT_COL}").alias(CORRUPT_COL))
        return parsed.select(*cols)
    r = spark.read
    if sample_fraction:
        r = r.option("samplingRatio", str(sample_fraction))
    return r.json(path)


def corrupt_records(df: DataFrame) -> DataFrame:
    """The captured bad lines (empty frame if none / not captured)."""
    if CORRUPT_COL not in df.columns:
        return df.limit(0)
    return df.filter(F.col(CORRUPT_COL).isNotNull()) \
             .select(CORRUPT_COL)


def valid_records(df: DataFrame) -> DataFrame:
    """Rows that parsed cleanly, corrupt-capture column dropped."""
    if CORRUPT_COL not in df.columns:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def read_csv(spark: SparkSession, path: str, schema=None,
             header: bool = True, infer: bool = False,
             sep: str = ",") -> DataFrame:
    """CSV with explicit schema (scale path) or inference (parity with
    the reference quick start — costs an extra pass)."""
    r = (spark.read.option("header", str(header).lower())
         .option("sep", sep))
    if schema is not None:
        r = r.schema(schema)
    elif infer:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                num_files: int | None = None) -> None:
    """JSONL sink; ``num_files`` coalesces (small outputs) or
    repartitions (parallel large writes)."""
    if num_files is not None:
        n = df.rdd.getNumPartitions()
        df = df.coalesce(num_files) if num_files < n \
            else df.repartition(num_files)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def stream_jsonl(spark: SparkSession, path: str, schema,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source STREAMING read of a JSONL directory — the incremental
    ingestion shape (new dump lands, pipeline picks it up). Schema is
    mandatory (streaming sources cannot infer)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.json(path)
