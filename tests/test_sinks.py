"""Tests for sources/sinks.py (layout writers, Z-order) and
operators/incremental.py (mergeable aggregate states)."""
import glob
import os

import numpy as np
import pandas as pd
import pytest


def test_write_partitioned_layout(spark, tmp_path):
    from handyspark_spark.sources.sinks import write_partitioned
    pdf = pd.DataFrame({"k": ["a", "b"] * 50, "v": range(100)})
    path = str(tmp_path / "part")
    write_partitioned(spark.createDataFrame(pdf), path, ["k"],
                      sort_cols=["v"])
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/k=*"))
    assert dirs == ["k=a", "k=b"]
    # one task per partition dir -> one data file each
    for d in dirs:
        files = glob.glob(f"{path}/{d}/*.parquet")
        assert len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 100


def test_compact_to_target_file_count(spark, tmp_path):
    from pyspark.sql import functions as F

    from handyspark_spark.sources.sinks import compact_to_target
    df = spark.range(50_000).withColumn(
        "pad", F.md5(F.col("id").cast("string")))
    path = str(tmp_path / "compact")
    n = compact_to_target(df, path, target_file_bytes=64 * 1024)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n
    assert 2 <= n <= 64          # sized from data, not default parallelism


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from handyspark_spark.sources.sinks import write_bucketed
    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(1000).withColumnRenamed("id", "k")
    write_bucketed(a, "t_bkt_a", "k", 4)
    write_bucketed(b, "t_bkt_b", "k", 4)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: the point is that bucketing makes
        # the sort-merge join exchange-free (broadcast would hide it)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_bkt_a").join(spark.table("t_bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_zorder_value_interleaves():
    from pyspark.sql import functions as F
    # pure-expression check via spark-less arithmetic: verified in the
    # oracle query too; here pin the python-side reference property
    def z2(x, y, bits=8):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z
    assert z2(0, 0) == 0
    assert z2(1, 0) == 1
    assert z2(0, 1) == 2
    assert z2(255, 255) == 65535
    # locality: nearby (x, y) stay nearby in z
    assert abs(z2(10, 20) - z2(11, 20)) < 64


def test_zorder_files_cover_small_rectangles(spark, tmp_path):
    """The actual data-skipping claim: after zorder_by, each parquet
    file's (x, y) min/max box is much smaller than under an x-only sort,
    so predicates on y prune files too."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from handyspark_spark.sources.sinks import zorder_by
    n = 64_000
    df = (spark.range(n)
          .withColumn("x", (F.col("id") * 7919) % 256)
          .withColumn("y", (F.col("id") * 104729) % 256))

    def avg_y_span(path):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "y":
                        st = col.statistics
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                spans.append(hi - lo)
        return sum(spans) / len(spans)

    p_x = str(tmp_path / "xsort")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.parquet(p_x))
    p_z = str(tmp_path / "zsort")
    zorder_by(df, ["x", "y"], bits=8, num_files=16).write.parquet(p_z)
    # x-sorted files see the full y range (~255); z-ordered files see a
    # fraction of it
    assert avg_y_span(p_z) < avg_y_span(p_x) * 0.7


def test_incremental_merge_matches_direct(spark):
    from pyspark.sql import functions as F

    from handyspark_spark.operators.incremental import (finalize_state,
                                                        merge_states,
                                                        partial_aggregate)
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"k": rng.randint(0, 7, 500),
                        "v": rng.uniform(-10, 10, 500)})
    # key 6 only in slice b; key 5 only in slice a
    pdf.loc[pdf["k"] == 6, "k"] = 6
    df = spark.createDataFrame(pdf)
    sa = df.filter((F.col("v") < 0) | (F.col("k") == 5))
    sb = df.subtract(sa)
    m = finalize_state(
        merge_states(partial_aggregate(sa, ["k"], "v"),
                     partial_aggregate(sb, ["k"], "v"), ["k"]), ["k"])
    direct = df.groupBy("k").agg(
        F.count("v").alias("n"), F.round(F.sum("v"), 6).alias("total"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev("v"), 6).alias("std"),
        F.min("v").alias("min"), F.max("v").alias("max"))
    got = {r.k: r.asDict() for r in m.collect()}
    exp = {r.k: r.asDict() for r in direct.collect()}
    assert set(got) == set(exp)
    for k in exp:
        for f in ("n", "total", "mean", "min", "max"):
            assert abs(got[k][f] - exp[k][f]) < 1e-6, (k, f)
        if exp[k]["std"] is not None:
            assert abs(got[k]["std"] - exp[k]["std"]) < 1e-5


def test_incremental_merge_is_order_insensitive(spark):
    from handyspark_spark.operators.incremental import (merge_states,
                                                        partial_aggregate)
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [1.0, 2, 3, 4, 5]})
    df = spark.createDataFrame(pdf)
    s1 = partial_aggregate(df.limit(2), ["k"], "v")
    s2 = partial_aggregate(df.subtract(df.limit(2)), ["k"], "v")
    ab = {r.k: (r.n, r.s, r.mn, r.mx)
          for r in merge_states(s1, s2, ["k"]).collect()}
    ba = {r.k: (r.n, r.s, r.mn, r.mx)
          for r in merge_states(s2, s1, ["k"]).collect()}
    assert ab == ba


# ---------------------------------------------------------------------------
# text-format sources (JSONL / CSV ingestion)
# ---------------------------------------------------------------------------

def test_read_jsonl_corrupt_capture_and_roundtrip(spark, tmp_path):
    import gzip
    import json
    d = tmp_path / "jl"
    d.mkdir()
    rows = [{"doc_id": i, "text": f"doc {i}", "n": i * 2} for i in range(20)]
    with open(d / "a.jsonl", "w") as f:
        for r in rows[:10]:
            f.write(json.dumps(r) + "\n")
        f.write("{not valid json\n")
    with gzip.open(d / "b.jsonl.gz", "wt") as f:
        for r in rows[10:]:
            f.write(json.dumps(r) + "\n")
    from handyspark_spark.sources.textsource import (corrupt_records,
                                                     read_jsonl,
                                                     valid_records)
    df = read_jsonl(spark, str(d),
                    schema="doc_id long, text string, n long")
    good = valid_records(df)
    assert good.count() == 20          # gz + plain both read
    assert {r["doc_id"] for r in good.collect()} == set(range(20))
    bad = corrupt_records(df).collect()
    assert len(bad) == 1 and "not valid" in bad[0][0]


def test_read_jsonl_infer_and_csv(spark, tmp_path):
    import json
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"a": i, "b": f"x{i}"}) + "\n")
    from handyspark_spark.sources.textsource import read_csv, read_jsonl
    inferred = read_jsonl(spark, str(p))
    assert set(inferred.columns) == {"a", "b"} and inferred.count() == 5
    c = tmp_path / "t.csv"
    c.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(c), infer=True)
    assert [r["a"] for r in df.orderBy("a").collect()] == [1, 2]
    assert dict(df.dtypes)["a"] == "int"


def test_write_jsonl_roundtrip_and_stream(spark, tmp_path, tables):
    from pyspark.sql import functions as F
    from handyspark_spark.sources.textsource import (read_jsonl,
                                                     stream_jsonl,
                                                     write_jsonl)
    src = tables["documents"].select("doc_id", "source", "n_chars")
    out = str(tmp_path / "out")
    write_jsonl(src, out, num_files=2)
    back = read_jsonl(spark, out,
                      schema="doc_id long, source string, n_chars long")
    from handyspark_spark.sources.textsource import valid_records
    assert valid_records(back).count() == src.count()
    # streaming file-source over the same directory, one batch
    stream = stream_jsonl(spark, out,
                          "doc_id long, source string, n_chars long")
    agg = stream.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("memory").queryName("tsrc")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["source"]: r["n"] for r in
           spark.sql("SELECT * FROM tsrc").collect()}
    want = {r["source"]: r["n"] for r in
            src.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    assert got == want


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    import json
    from pyspark.sql import types as T
    from handyspark_spark.sources.textsource import read_jsonl
    p = tmp_path / "m.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"a": 1}) + "\n")
    schema = T.StructType([T.StructField("a", T.LongType())])
    before = [f.name for f in schema.fields]
    read_jsonl(spark, str(p), schema=schema).collect()
    assert [f.name for f in schema.fields] == before, \
        "caller schema must not grow a _corrupt_record field"


def test_write_training_shards_replays_global_permutation(spark, tables,
                                                          tmp_path):
    from pyspark.sql import functions as F
    from handyspark_spark.pipeline.sample import deterministic_shuffle
    from handyspark_spark.sources.writer import write_training_shards
    docs = tables["documents"]
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4, key_col="doc_id")
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # reading all shards sorted by the persisted key replays the exact
    # deterministic_shuffle order
    got = [r["doc_id"] for r in
           back.orderBy("_shard_key", "doc_id").select("doc_id").collect()]
    exp = [r["doc_id"] for r in
           deterministic_shuffle(docs, "doc_id").select("doc_id").collect()]
    assert got == exp
    # each shard internally sorted
    import glob
    import pandas as pd
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4
    for f in files:
        keys = pd.read_parquet(f)["_shard_key"].tolist()
        assert keys == sorted(keys)


def test_write_training_shards_split_dirs(spark, tables, tmp_path):
    from pyspark.sql import functions as F
    from handyspark_spark.pipeline.sample import split_assign
    from handyspark_spark.sources.writer import write_training_shards
    docs = split_assign(tables["documents"], "doc_id")
    path = str(tmp_path / "shards_split")
    write_training_shards(docs, path, n_shards=2, key_col="doc_id",
                          split_col="split")
    import os
    dirs = {d for d in os.listdir(path) if d.startswith("split=")}
    assert "split=train" in dirs
    back = spark.read.parquet(path)
    assert back.count() == docs.count()


def test_orc_roundtrip_and_pushdown(spark, tables, tmp_path):
    from pyspark.sql import functions as F
    from handyspark_spark.core.util import explain_str
    from handyspark_spark.sources.writer import read_orc, write_orc
    path = str(tmp_path / "orders_orc")
    write_orc(tables["orders"], path)
    back = read_orc(spark, path)
    assert back.count() == tables["orders"].count()
    a = sorted(map(tuple, tables["orders"]
                   .select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, back
                   .select("o_orderkey", "o_totalprice").collect()))
    assert a == b
    plan = explain_str(back.select("o_orderkey")
                       .filter(F.col("o_orderkey") < 100))
    assert "PushedFilters" in plan and "LessThan(o_orderkey" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "o_totalprice" not in read_schema
