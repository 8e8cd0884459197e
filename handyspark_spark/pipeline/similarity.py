"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

- ``brute_force_topk``: exact cosine top-k via a broadcast join of the
  (small) query set against the corpus — the correctness baseline. The
  dot product is a native ``F.zip_with`` + ``F.aggregate`` expression
  (JVM-side, no Python). Per-query top-k via window ``row_number``.
- ``lsh_topk`` / ``lsh_neardup_pairs``: random-hyperplane (signed random
  projection) LSH — bucket vectors by sign bits, search only within
  matching buckets. The scale path: shuffle is one groupBy on bucket ids,
  and the pair space shrinks exponentially with bits.
- ``ivf_topk``: IVF-style variant — k-means-ish coarse centroids (sampled
  deterministically), vectors assigned to nearest centroid, queries probe
  ``nprobe`` nearest centroids only.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def normalized_expr(a: Column) -> Column:
    """Unit-normalize inside one expression. AVOID in hot paths: Catalyst's
    CollapseProject inlines the norm aggregate into the transform lambda
    and re-evaluates it per element — O(dim²)/row. Hot paths instead carry
    the scalar norm alongside the raw vector (``with_norm``) and divide
    once per PAIR: cosine = dot(a,b)/(na*nb)."""
    n = norm_expr(a)
    return F.transform(a, lambda x: x / n)


def with_norm(df: DataFrame, src: Column, vec_name: str,
              norm_name: str) -> DataFrame:
    """Project the raw vector plus its scalar L2 norm — O(dim) once per
    row, immune to projection collapse (the norm lives in its own column,
    never inside an array lambda)."""
    return df.withColumn(vec_name, src).withColumn(norm_name,
                                                   norm_expr(F.col(vec_name)))


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id") \
        -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.
    queries: DataFrame with (id_col, vec_col). Broadcast the query side —
    the corpus is scanned once, no shuffle of the corpus itself; the only
    shuffle is the per-query top-k (rows = |queries| × |corpus| reduced by
    the window to |queries| × k)."""
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_q0")),
        F.col("_q0"), "_qv", "_qn").drop("_q0")
    c = with_norm(
        df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).cast("array<double>").alias("_c0")),
        F.col("_c0"), "_cv", "_cn").drop("_c0")
    cos = dot_expr(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = (c.crossJoin(F.broadcast(q))
               .filter(F.col("query_id") != F.col("neighbor_id"))
               .select("query_id", "neighbor_id",
                       F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def neardup_pairs_blas(df: DataFrame, vec_col: str = "embedding",
                       id_col: str = "vec_id", threshold: float = 0.9,
                       round_to: int = 6, blocks: int = 8) -> DataFrame:
    """Exact cosine-over-threshold pairs, vectorized and fully distributed.

    Blocked all-pairs: rows hash into ``blocks`` buckets by id; each of
    the B(B+1)/2 unordered block pairs is one ``applyInPandas`` group,
    each row is shuffled to the B groups it participates in, and each
    group runs ONE numpy/BLAS matmul between its two blocks. Task memory
    is bounded by 2·|corpus|/blocks rows — nothing is ever materialized
    on the driver. (The previous design collected the whole corpus
    driver-side and broadcast the dense matrix; at 10M × 768-d that is
    ~30 GB on one machine.)

    Compute is inherently O(n²/2) dot products — that IS the exact
    contract. At 100 TB, run ``lsh_neardup_pairs`` to get candidates (or
    this function on an LSH-bucketed subset), and size ``blocks`` ≈
    corpus_bytes / per-task memory budget so two blocks fit in one task.
    Shuffle volume is blocks× the corpus — B stays small (8-64); the
    win is bounded memory and B(B+1)/2-way parallel BLAS."""
    import pandas as pd
    from pyspark.sql import types as T

    v = df.select(F.col(id_col).cast("long").alias("_id"),
                  F.col(vec_col).cast("array<double>").alias("_v"))
    v = v.withColumn(
        "_b", F.pmod(F.xxhash64(F.col("_id")), F.lit(blocks)).cast("int"))
    # replicate each row to every block pair it belongs to: row in block b
    # lands in groups {(min(b,j), max(b,j)) : j in 0..B-1}, all distinct
    keyed = (v.withColumn(
                 "_j", F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))))
              .select(F.least("_b", "_j").alias("_gi"),
                      F.greatest("_b", "_j").alias("_gj"),
                      "_id", "_v", "_b"))

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType())])

    def _norm_rows(sub: "pd.DataFrame"):
        ids = sub["_id"].to_numpy()
        M = np.array(sub["_v"].tolist(), dtype=np.float64)
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0              # zero vectors: cosine treated as 0
        return ids, M / n

    def block_pairs(key, pdf):
        gi, gj = key
        if gi == gj:                 # intra-block: upper triangle once
            ids, M = _norm_rows(pdf)
            cos = np.round(M @ M.T, round_to)
            ii, jj = np.where(cos >= threshold)
            keep = ids[ii] < ids[jj]
            return pd.DataFrame({"id_a": ids[ii][keep],
                                 "id_b": ids[jj][keep],
                                 "cosine": cos[ii, jj][keep]})
        # cross-block: each unordered pair exists in exactly this group
        in_i = pdf["_b"].to_numpy() == gi
        if in_i.all() or not in_i.any():     # one side empty: no pairs
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids_a, A = _norm_rows(pdf[in_i])
        ids_b, B = _norm_rows(pdf[~in_i])
        cos = np.round(A @ B.T, round_to)
        ii, jj = np.where(cos >= threshold)
        ia, ib = ids_a[ii], ids_b[jj]
        return pd.DataFrame({"id_a": np.minimum(ia, ib),
                             "id_b": np.maximum(ia, ib),
                             "cosine": cos[ii, jj]})

    return keyed.groupBy("_gi", "_gj").applyInPandas(block_pairs, out_schema)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def srp_bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id: sign bit per hyperplane packed
    into an int — a native expression per plane (no UDF)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                       lambda v, w: v * w),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                      id_col: str = "vec_id", threshold: float = 0.9,
                      bits: int = 8, tables: int = 2,
                      dim: int | None = None, seed: int = 42) -> DataFrame:
    """Approximate cosine-near-dup pairs: join only within matching SRP
    buckets (union over ``tables`` independent hash tables), verify exact
    cosine on candidates."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    v = df.select(F.col(id_col).alias("_id"),
                  F.col(vec_col).cast("array<double>").alias("_v"))
    cands = None
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + t)
        bucketed = v.withColumn("_b", srp_bucket_expr(F.col("_v"), planes)) \
                    .withColumn("_t", F.lit(t))
        a, b = bucketed.alias("a"), bucketed.alias("b")
        p = (a.join(b, (F.col("a._b") == F.col("b._b")) &
                       (F.col("a._t") == F.col("b._t")) &
                       (F.col("a._id") < F.col("b._id")))
              .select(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"),
                      F.col("a._v").alias("_va"), F.col("b._v").alias("_vb")))
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.dropDuplicates(["id_a", "id_b"])
    cos = cosine_expr(F.col("_va"), F.col("_vb"))
    return (cands.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
                 .filter(F.col("cosine") >= threshold))


def _cap_query_rows(queries: DataFrame, max_query_rows: int | None,
                    op: str) -> None:
    """Loud guard for the "queries are small" contract: ``pq_topk``
    collects the query frame to build driver-side LUTs and ``ivf_topk``
    broadcasts it — both are bounded by |queries|, and a caller passing
    a corpus-sized frame would melt the driver/executors silently.
    Limit-probed (reads at most cap+1 rows, same pattern as
    ``max_bitmask_rows``); pass ``max_query_rows=None`` to opt out."""
    if max_query_rows is None:
        return
    n = queries.limit(max_query_rows + 1).count()
    if n > max_query_rows:
        raise ValueError(
            f"{op} holds the query frame driver/broadcast-side (contract: "
            f"queries are small) and it exceeds "
            f"max_query_rows={max_query_rows}; batch the query side, use "
            f"brute_force_topk / neardup_pairs_blas for frame-vs-frame "
            f"search, or pass max_query_rows=None to force")



def ivf_fit_centroids(df: DataFrame, n_centroids: int = 16,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      kmeans_iters: int = 0) -> np.ndarray:
    """Fit the IVF coarse quantizer: deterministic hash-ordered sample of
    ``n_centroids`` corpus vectors, L2-normalized, optionally refined
    with ``kmeans_iters`` distributed spherical-Lloyd rounds (assign via
    the BLAS matmul, recompute cell means via posexplode + one grouped
    avg, renormalize; empty cells keep their previous centroid). The
    returned (n_centroids × dim) matrix is driver-tiny. At 100 TB this
    runs ONCE — persist it with ``pipeline.ann_index.IVFIndex`` instead
    of refitting per query batch."""
    import pandas as pd

    cents = (df.orderBy(F.md5(F.col(id_col).cast("string")))
               .limit(n_centroids)
               .select(F.col(vec_col).cast("array<double>").alias("_cent"))
               .collect())
    C = np.array([r["_cent"] for r in cents], dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext

    for _ in range(kmeans_iters):
        b_it = sc.broadcast(C)

        def _assign(vs, _b=b_it):
            X = np.array(vs.tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            return pd.Series(
                np.argmax(X @ _b.value.T, axis=1).astype("int32"))

        assign_udf = F.pandas_udf(_assign, "int")
        a = (df.select(F.col(vec_col).cast("array<double>").alias("_v"))
             .withColumn("_cell", assign_udf(F.col("_v")))
             .select("_cell", F.posexplode("_v").alias("pos", "val")))
        rows = (a.groupBy("_cell", "pos").agg(F.avg("val").alias("m"))
                .collect())
        C_new = C.copy()
        agg = {}
        for r in rows:
            agg.setdefault(r["_cell"], {})[r["pos"]] = r["m"]
        for cell, d in agg.items():
            vec = np.array([d[p] for p in sorted(d)], dtype=np.float64)
            n = np.linalg.norm(vec)
            if n > 0:
                C_new[cell] = vec / n
        C = C_new
        b_it.destroy()
    return C


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 42, kmeans_iters: int = 0,
             centroids: np.ndarray | None = None,
             max_query_rows: int | None = 100_000) -> DataFrame:
    """IVF-flat ANN: coarse-quantizer centroids -> assign corpus rows
    to nearest centroid (one projection) -> each query probes its
    ``nprobe`` nearest centroids -> exact cosine within probed cells.
    At 100 TB the cell assignment is written once (partitioned by cell) and
    queries touch nprobe/n_centroids of the data.

    ``centroids``: a pre-fitted quantizer (e.g. loaded via
    ``pipeline.ann_index.IVFIndex.load``) — skips the fit entirely, the
    train-once/probe-many production shape. Without it the quantizer is
    fitted inline by ``ivf_fit_centroids`` (see it for ``kmeans_iters``)."""
    import pandas as pd

    _cap_query_rows(queries, max_query_rows, "ivf_topk")
    C = centroids if centroids is not None else ivf_fit_centroids(
        df, n_centroids, vec_col, id_col, kmeans_iters)
    nprobe = min(nprobe, len(C))
    sc = df.sparkSession.sparkContext
    b_C = sc.broadcast(C)

    # centroid assignment as one BLAS matmul per Arrow batch — a literal
    # centroid expression tree (n_centroids × dim constants) blows past
    # codegen limits and is ~10× slower
    def _cell_fn(vs):
        X = np.array(vs.tolist(), dtype=np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        return pd.Series(np.argmax(X @ b_C.value.T, axis=1).astype("int32"))

    def _cells_fn(vs):
        X = np.array(vs.tolist(), dtype=np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        order = np.argsort(-(X @ b_C.value.T), axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    _cell = F.pandas_udf(_cell_fn, "int")
    _cells = F.pandas_udf(_cells_fn, "array<int>")

    c = with_norm(
        df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).cast("array<double>").alias("_c0")),
        F.col("_c0"), "_cv", "_cn").drop("_c0")
    c = c.withColumn("_cell", _cell(F.col("_cv")))
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_q0")),
        F.col("_q0"), "_qv", "_qn").drop("_q0")
    q = q.withColumn("_cells", _cells(F.col("_qv")))
    joined = (c.join(F.broadcast(q),
                     F.array_contains(F.col("_cells"), F.col("_cell")))
               .filter(F.col("query_id") != F.col("neighbor_id")))
    cos = dot_expr(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (joined.select("query_id", "neighbor_id",
                          F.round(cos, 6).alias("cosine"))
                  .withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def label_centroids(df: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label",
                    assemble: bool = False) -> DataFrame:
    """Per-label mean vector (cluster centroids — the IVF coarse-quantizer
    building block and the standard embedding-cluster summary).

    ``posexplode`` fans each vector into (pos, val) rows, one
    ``groupBy(label, pos)`` averages them — map-side partial aggregation
    makes the shuffle |labels| × dim rows regardless of corpus size.
    Long form (label, pos, centroid) by default; ``assemble=True`` adds a
    second tiny agg that re-assembles ordered ``array<double>`` vectors.
    """
    ex = df.select(F.col(label_col).alias("label"),
                   F.posexplode(F.col(vec_col).cast("array<double>"))
                   .alias("pos", "val"))
    long_form = (ex.groupBy("label", "pos")
                 .agg(F.avg("val").alias("centroid")))
    if not assemble:
        return long_form
    return (long_form.groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
                lambda s: s["centroid"]).alias("centroid")))


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        bits: int = 8) -> DataFrame:
    """Symmetric per-dimension linear quantization of an embedding column
    to ``bits``-bit signed integers — the standard 4× (int8) storage/
    bandwidth cut before ANN indexing, with per-dim scales preserved for
    dequantization.

    q[d] = round(x[d] / scale[d] * (2^(bits-1) - 1)),
    scale[d] = max over the corpus of |x[d]| (0-max dims quantize to 0).

    Plan: per-dim max-abs via ONE posexplode + groupBy(dim) — map-side
    partial max makes the shuffle |dim| rows regardless of corpus size —
    re-assembled into an ordered scale vector in a 1-row frame and
    broadcast back; quantization itself is a zip_with projection. Returns
    (id_col, qvec: array<int>, scales: array<double>)."""
    qmax = (1 << (bits - 1)) - 1
    dims = (df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                      .alias("_pos", "_val"))
            .groupBy("_pos").agg(F.max(F.abs(F.col("_val"))).alias("_s")))
    scales = dims.agg(
        F.array_sort(F.collect_list(F.struct("_pos", "_s")))
        .alias("_ps")).select(
        F.transform(F.col("_ps"), lambda x: x["_s"]).alias("scales"))
    q = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("scales"),
        lambda x, s: F.when(s > 0, F.round(x / s * qmax))
                      .otherwise(F.lit(0.0)).cast("int"))
    return (df.crossJoin(F.broadcast(scales))
            .select(F.col(id_col), q.alias("qvec"), "scales"))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-bounded approximate search codes
# ---------------------------------------------------------------------------

def pq_codebooks(df: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id", m: int = 8, nbits: int = 4,
                 sample_n: int = 2048, iters: int = 5,
                 seed: int = 42) -> np.ndarray:
    """Train PQ codebooks on a BOUNDED deterministic sample (hash-ordered
    ``limit`` — never the full corpus): split the (L2-normalized) vectors
    into ``m`` subspaces and run a small numpy k-means (2^nbits centroids,
    ``iters`` Lloyd rounds, seeded init) per subspace. Returns
    (m, 2^nbits, dim/m). The codebook is driver-tiny (m * k * dsub
    floats) and broadcast to encoders/searchers."""
    rows = (df.orderBy(F.md5(F.col(id_col).cast("string")))
            .limit(sample_n)
            .select(F.col(vec_col).cast("array<double>").alias("_v"))
            .collect())
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return _fit_subspace_books(X, m, nbits, iters, seed)


def _fit_subspace_books(X: np.ndarray, m: int, nbits: int,
                        iters: int, seed: int) -> np.ndarray:
    """Per-subspace numpy k-means over a driver-side sample matrix —
    shared by flat-PQ (raw vectors) and IVF-PQ (cell residuals)."""
    k = 1 << nbits
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        C = S[rng.choice(len(S), size=k, replace=len(S) < k)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books[j] = C
    return books


def pq_encode(df: DataFrame, books: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id",
              code_col: str = "pq_code") -> DataFrame:
    """Encode every vector as ``m`` small centroid ids — a pure
    Arrow-batched projection (one argmin per subspace, vectorized).
    Output is |docs| x m bytes-ish: the memory-bounded representation
    ANN search scans instead of the raw vectors."""
    m, k, dsub = books.shape
    b_books = df.sparkSession.sparkContext.broadcast(books)

    @F.pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        B = b_books.value
        X = np.array(vs.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), m), dtype=np.int64)
        for j in range(m):
            S = X[:, j * dsub:(j + 1) * dsub]
            d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series([c.tolist() for c in codes])

    return df.withColumn(
        code_col, _enc(F.col(vec_col).cast("array<double>")))


def pq_topk(df: DataFrame, queries: DataFrame, k: int = 5,
            m: int = 8, nbits: int = 4, sample_n: int = 2048,
            vec_col: str = "embedding", id_col: str = "vec_id",
            seed: int = 42, rerank: int | None = None,
            books: np.ndarray | None = None,
            encoded: DataFrame | None = None,
            dtype: str = "float32",
            max_query_rows: int | None = 100_000) -> DataFrame:
    """PQ/ADC approximate top-k: corpus scanned as codes, each query
    precomputes an (m x 2^nbits) inner-product lookup table against the
    codebooks, score = sum of table entries addressed by the code —
    asymmetric distance computation. Per Arrow batch the score matrix is
    a vectorized LUT gather; each batch emits only its local top-k per
    query (output k x |queries| rows per batch, NEVER the full cross
    product), then one window takes the global top-k. The exact
    ``brute_force_topk`` is the oracle; recall is pinned in tests.

    ``rerank=C`` is the production pattern: ADC selects the top C
    candidates per query (C >> k), then ONLY those C rows are re-scored
    with exact cosine against the raw vectors — recall approaches exact
    at C/|corpus| of the exact cost. Without it, pure ADC recall is
    bounded by quantization error (worst on unclustered vectors).

    ``books``: pre-trained codebooks (e.g. loaded via
    ``pipeline.ann_index.PQIndex.load``) — skips the training sample,
    the train-once/probe-many production shape.

    ``encoded``: a pre-encoded corpus frame carrying (``id_col``,
    pq_code) — the ``pq_encode`` output, typically read back from a
    persisted parquet layout. The ADC scan then touches ONLY the code
    columns (never re-encodes raw vectors — at 100 TB that is the
    difference between scanning |docs| x m small ints and re-running
    the encode projection per query batch); requires ``books`` (the
    frozen codebooks the codes were encoded with). The raw ``df`` is
    still consulted by the ``rerank`` path, which joins true vectors
    back for ONLY the shortlisted rows.

    ``dtype`` picks the ADC LUT-gather precision. fp32 is the
    PRODUCTION DEFAULT (round-8 A/B at sf1, 200k-vector corpus, 2000
    queries: 3.44s -> 2.30s median, 1.5x — the scan is memory-bound
    and fp32 halves LUT traffic; quantization error already dwarfs
    fp32 rounding, the rerank path rescores in exact fp64 cosine, and
    the top-k came out IDENTICAL across all 2000 queries). Pass
    'float64' for a bit-stable fp64 shortlist — the convention the
    exported-codebook DuckDB oracles pin."""
    _cap_query_rows(queries, max_query_rows, "pq_topk")
    if encoded is not None and books is None:
        raise ValueError(
            "pq_topk(encoded=...) requires the frozen books= the codes "
            "were encoded with — refitting here would silently mismatch "
            "the stored codes")
    if books is None:
        books = pq_codebooks(df, vec_col, id_col, m=m, nbits=nbits,
                             sample_n=sample_n, seed=seed)
    else:
        books = np.asarray(books, dtype=np.float64)
        m, _, _ = books.shape
    if encoded is not None:
        enc = encoded.select(F.col(id_col).alias("neighbor_id"),
                             "pq_code")
    else:
        enc = pq_encode(df, books, vec_col, id_col).select(
            F.col(id_col).alias("neighbor_id"), "pq_code")
    # The ADC scan's parallelism must come from the CLUSTER, not from
    # however many files the compact codes table happens to occupy: a
    # 200k-row codes.parquet reads as ~3 input splits, serializing a
    # |queries| x |codes| numpy scan into 3 tasks (measured 98s at
    # 2000 x 200k where 32 tasks do it in ~8s). The codes are a few
    # bytes per row, so the round-robin shuffle is trivial next to one
    # serialized scan; at production scale the table spans >= cluster
    # parallelism in files and this is a no-op.
    par = df.sparkSession.sparkContext.defaultParallelism
    if enc.rdd.getNumPartitions() < par:
        enc = enc.repartition(par)

    qrows = (queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).cast("array<double>")
                            .alias("_q")).collect())
    qids = np.array([r["query_id"] for r in qrows])
    Q = np.array([r["_q"] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    mm, kk, dsub = books.shape
    # LUT[q, j, c] = <q_subj, books[j, c]> — built in fp64, downcast
    # once here so fp32 runs gather/accumulate half-width end to end
    _dt = np.float32 if dtype in ("float32", "fp32") else np.float64
    lut = np.einsum("qjd,jcd->qjc",
                    Q.reshape(len(Q), mm, dsub), books).astype(_dt)
    sc = df.sparkSession.sparkContext
    b_lut, b_qids = sc.broadcast(lut), sc.broadcast(qids)

    # id fields keep the input id column's type (string/int/long ids all
    # round-trip; a hardcoded long would corrupt non-long ids)
    _idt = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("query_id", _idt),
        T.StructField("neighbor_id", _idt),
        T.StructField("score", T.DoubleType())])

    def _batch_topk(it):
        L, ids = b_lut.value, b_qids.value
        nq = len(ids)
        take = max(k, rerank or 0)
        for pdf in it:
            codes = np.array(pdf["pq_code"].tolist(), dtype=np.int64)
            nb = np.asarray(pdf["neighbor_id"])
            # scores: (nq, rows) = sum_j LUT[:, j, codes[:, j]]
            s = np.zeros((nq, len(codes)), dtype=L.dtype)
            for j in range(mm):
                s += L[:, j, codes[:, j]]
            # self-matches are masked BEFORE the local top-take: the
            # query's own corpus row would otherwise consume a slot in
            # its batch, silently shrinking the effective shortlist by
            # one vs the (top-`take` excluding self) contract
            s[ids[:, None] == nb[None, :]] = -np.inf
            kk_local = min(take, len(codes))
            top = np.argpartition(-s, kk_local - 1, axis=1)[:, :kk_local]
            # deterministic (score desc, neighbor_id asc) selection at
            # the cut: argpartition breaks score ties arbitrarily, so a
            # tied candidate with the SMALLER id could be dropped here
            # while the global window would have kept it. Repair only
            # the queries whose ties straddle the boundary (near-dup
            # corpora hit this constantly — equal codes => equal ADC).
            v = np.take_along_axis(s, top, axis=1).min(axis=1)
            n_gt = (s > v[:, None]).sum(axis=1)
            n_eq = (s == v[:, None]).sum(axis=1)
            for qi in np.nonzero(n_gt + n_eq > kk_local)[0]:
                gti = np.nonzero(s[qi] > v[qi])[0]
                eqi = np.nonzero(s[qi] == v[qi])[0]
                need = kk_local - len(gti)
                keep = eqi[np.argsort(nb[eqi], kind="stable")[:need]]
                top[qi] = np.concatenate([gti, keep])
            res = {"query_id": np.repeat(ids, kk_local),
                   "neighbor_id": nb[top.ravel()],
                   "score": np.take_along_axis(s, top, axis=1).ravel()}
            yield pd.DataFrame(res)

    cand = enc.mapInPandas(_batch_topk, out_schema)
    cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    if rerank is None:
        return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id",
                        F.round("score", 6).alias("score"), "rank"))
    shortlist = (cand.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= rerank)
                 .select("query_id", "neighbor_id"))
    return _exact_rerank(df, queries, shortlist, k, vec_col, id_col,
                         shortlist_rows=len(qids) * rerank)


def _exact_rerank(df: DataFrame, queries: DataFrame, shortlist: DataFrame,
                  k: int, vec_col: str, id_col: str,
                  shortlist_rows: int | None = None) -> DataFrame:
    """Exact re-rank of a (query_id, neighbor_id) shortlist: join raw
    vectors back in (hash join keyed on the corpus id — touches only
    candidate rows) and score true cosine; the broadcast query frame
    carries the query vectors. Shared by the PQ and IVF-PQ rerank
    paths.

    ``shortlist_rows``: the caller's |queries| x rerank bound. When the
    shortlist is KNOWN large (the exact-switch shape, rerank ~ corpus)
    the corpus join is pinned to sort-merge — otherwise AQE sees a
    shuffle size under its broadcast threshold (ids compress well) and
    builds a multi-million-row HashedRelation on the driver, which
    measured 4x SLOWER than SMJ at sf10 (8 x 200k shortlist: rerank
    stage 8.2s broadcast vs 2.0s merge) and is a driver-memory hazard
    at scale. Small production shortlists (rerank ~ 50) keep AQE's
    broadcast conversion."""
    c = with_norm(
        df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).cast("array<double>").alias("_c0")),
        F.col("_c0"), "_cv", "_cn").drop("_c0")
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_q0")),
        F.col("_q0"), "_qv", "_qn").drop("_q0")
    if shortlist_rows is not None and shortlist_rows > 500_000:
        c = c.hint("merge")
    scored = (shortlist.join(c, "neighbor_id")
              .join(F.broadcast(q), "query_id"))
    cos = dot_expr(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                F.asc("neighbor_id"))
    return (scored.select("query_id", "neighbor_id",
                          F.round(cos, 6).alias("cosine"))
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .withColumnRenamed("cosine", "score"))


# ---------------------------------------------------------------------------
# IVF-PQ — coarse inverted lists + product-quantized residuals
# (Jegou, Douze, Schmid: "Product quantization for nearest neighbor
# search", TPAMI 2011 — the standard billion-scale ANN layout).
# ---------------------------------------------------------------------------

def ivfpq_fit(df: DataFrame, n_centroids: int = 16, m: int = 8,
              nbits: int = 4, sample_n: int = 2048, iters: int = 5,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42, kmeans_iters: int = 0) \
        -> tuple[np.ndarray, np.ndarray]:
    """Fit IVF-PQ: the IVF coarse quantizer plus PQ codebooks trained on
    CELL RESIDUALS (x_norm - centroid[cell]) of a bounded deterministic
    sample. Residual quantization is what makes IVF-PQ beat flat PQ:
    residual magnitudes are a fraction of vector magnitudes, so the same
    code budget quantizes much finer. Returns (centroids, books) — both
    driver-tiny; persist with ``pipeline.ann_index.IVFPQIndex`` at scale
    (train ONCE, probe for months)."""
    C = ivf_fit_centroids(df, n_centroids, vec_col, id_col, kmeans_iters)
    rows = (df.orderBy(F.md5(F.col(id_col).cast("string")))
            .limit(sample_n)
            .select(F.col(vec_col).cast("array<double>").alias("_v"))
            .collect())
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(X @ C.T, axis=1)
    books = _fit_subspace_books(X - C[cells], m, nbits, iters, seed)
    return C, books


def ivfpq_encode(df: DataFrame, centroids: np.ndarray, books: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 cell_col: str = "cell",
                 code_col: str = "pq_code") -> DataFrame:
    """Encode the corpus for IVF-PQ: ONE Arrow-batched projection adds
    (cell id, residual PQ code) — one normalization, one centroid
    matmul, one residual encode per batch. All input columns are kept,
    so the encoded corpus can be written out once
    ``.write.partitionBy(cell_col)`` — the layout where a probe reads
    nprobe/n_centroids of the files and searches scan CODES
    (|docs| x m small ints) instead of raw vectors. Codes stay
    comparable across batches because the codebooks are frozen."""
    C = np.asarray(centroids, dtype=np.float64)
    B = np.asarray(books, dtype=np.float64)
    mm, _, dsub = B.shape
    sc = df.sparkSession.sparkContext
    b_C, b_books = sc.broadcast(C), sc.broadcast(B)

    @F.pandas_udf(f"{cell_col} int, {code_col} array<int>")
    def _enc(vs: pd.Series) -> pd.DataFrame:
        Cv, Bv = b_C.value, b_books.value
        X = np.array(vs.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cells = np.argmax(X @ Cv.T, axis=1)
        R = X - Cv[cells]
        codes = np.empty((len(X), mm), dtype=np.int64)
        for j in range(mm):
            S = R[:, j * dsub:(j + 1) * dsub]
            d2 = ((S[:, None, :] - Bv[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame({cell_col: cells.astype("int32"),
                             code_col: [c.tolist() for c in codes]})

    return (df.withColumn("_e", _enc(F.col(vec_col)
                                     .cast("array<double>")))
            .withColumn(cell_col, F.col(f"_e.{cell_col}"))
            .withColumn(code_col, F.col(f"_e.{code_col}"))
            .drop("_e"))


def ivfpq_topk(df: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 16, nprobe: int = 4, m: int = 8,
               nbits: int = 4, sample_n: int = 2048,
               vec_col: str = "embedding", id_col: str = "vec_id",
               seed: int = 42, rerank: int | None = None,
               centroids: np.ndarray | None = None,
               books: np.ndarray | None = None,
               encoded: DataFrame | None = None,
               dtype: str = "float32",
               max_query_rows: int | None = 100_000) -> DataFrame:
    """IVF-PQ ANN top-k: corpus rows carry (cell id, residual PQ code) —
    ONE Arrow-batched projection; each query probes its ``nprobe``
    nearest cells and ADC-scores only rows in probed cells:

        score(q, x) ≈ <q, centroid[cell(x)]> + Σ_j LUT[q, j, code_j(x)]

    where the LUT holds residual-codebook inner products. Per Arrow
    batch the probe test is a boolean gather and the score a vectorized
    LUT sum; each batch emits only its local top-take per query, then
    one window takes the global top-k (identical output contract to
    ``pq_topk``). At 100 TB the encoded corpus is written once
    PARTITIONED BY CELL, so a probe reads nprobe/n_centroids of the
    files — the scan here filters the same fraction row-wise.

    ``nprobe >= n_centroids`` plus ``rerank >= |corpus|`` is the exact
    switch (every cell probed, every ADC candidate exact-rescored):
    output equals ``brute_force_topk`` — the oracle convention shared
    with ``ivf_topk``/``pq_topk``. Approximate recall is pinned in
    tests.

    ``encoded``: a pre-encoded corpus frame carrying (``id_col``,
    cell, pq_code) — the ``ivfpq_encode`` output, typically read back
    from a cell-partitioned parquet layout. The ADC scan then touches
    ONLY the code columns (never re-encodes raw vectors — at 100 TB
    that is the difference between scanning |docs| x m small ints and
    re-running the encode projection per query batch); requires
    ``centroids``/``books`` (the frozen index the codes were encoded
    with). The raw ``df`` is still consulted by the ``rerank`` path,
    which joins true vectors back for ONLY the shortlisted rows.

    ``dtype='float32'`` (the production default — round-8 sf1 A/B:
    2.53s -> 1.89s median, 1.34x, identical top-k) runs the ADC scan
    (centroid term + LUT gather) in fp32 — half the memory traffic;
    see ``pq_topk``. Pass 'float64' for the bit-stable shortlist the
    exported-codebook oracles pin."""
    _cap_query_rows(queries, max_query_rows, "ivfpq_topk")
    if encoded is not None and (centroids is None or books is None):
        raise ValueError(
            "ivfpq_topk(encoded=...) requires the frozen centroids= and "
            "books= the codes were encoded with — refitting here would "
            "silently mismatch the stored codes")
    if centroids is None or books is None:
        centroids, books = ivfpq_fit(
            df, n_centroids, m, nbits, sample_n,
            vec_col=vec_col, id_col=id_col, seed=seed)
    C = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(books, dtype=np.float64)
    n_centroids = len(C)
    nprobe = min(nprobe, n_centroids)
    mm, kk, dsub = books.shape
    sc = df.sparkSession.sparkContext

    if encoded is not None:
        enc = encoded.select(F.col(id_col).alias("neighbor_id"),
                             "cell", "pq_code")
    else:
        enc = ivfpq_encode(df, C, books, vec_col, id_col) \
            .select(F.col(id_col).alias("neighbor_id"), "cell", "pq_code")
    # Same file-layout-vs-cluster parallelism guard as pq_topk: any
    # cell filter the caller pushed into `encoded` sits BELOW this
    # shuffle, so parquet cell pruning still happens at the scan; only
    # the surviving (pruned) rows are spread.
    if enc.rdd.getNumPartitions() < sc.defaultParallelism:
        enc = enc.repartition(sc.defaultParallelism)

    qrows = (queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).cast("array<double>")
                            .alias("_q")).collect())
    qids = np.array([r["query_id"] for r in qrows])
    Q = np.array([r["_q"] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    cent_term = Q @ C.T                                   # (nq, ncent)
    # probe mask: True where query q probes cell c — selected in fp64
    # so probe choice never shifts with the scan dtype
    order = np.argsort(-cent_term, axis=1)[:, :nprobe]
    probe = np.zeros((len(Q), n_centroids), dtype=bool)
    np.put_along_axis(probe, order, True, axis=1)
    _dt = np.float32 if dtype in ("float32", "fp32") else np.float64
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), mm, dsub),
                    books).astype(_dt)
    b_lut = sc.broadcast(lut)
    b_qids = sc.broadcast(qids)
    b_cent = sc.broadcast(cent_term.astype(_dt))
    b_probe = sc.broadcast(probe)

    _idt = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("query_id", _idt),
        T.StructField("neighbor_id", _idt),
        T.StructField("score", T.DoubleType())])

    def _batch_topk(it):
        L, ids = b_lut.value, b_qids.value
        CT, P = b_cent.value, b_probe.value
        nq = len(ids)
        take = max(k, rerank or 0)
        for pdf in it:
            codes = np.array(pdf["pq_code"].tolist(), dtype=np.int64)
            cells = np.asarray(pdf["cell"], dtype=np.int64)
            nb = np.asarray(pdf["neighbor_id"])
            s = CT[:, cells].copy()                     # (nq, rows)
            for j in range(mm):
                s += L[:, j, codes[:, j]]
            # rows outside a query's probed cells never compete —
            # masked BEFORE the local top-take, exactly mirroring the
            # file-level pruning of a cell-partitioned layout
            s[~P[:, cells]] = -np.inf
            s[ids[:, None] == nb[None, :]] = -np.inf
            kk_local = min(take, len(codes))
            top = np.argpartition(-s, kk_local - 1, axis=1)[:, :kk_local]
            # deterministic tie repair at the cut (same contract as
            # pq_topk: score desc, neighbor_id asc)
            v = np.take_along_axis(s, top, axis=1).min(axis=1)
            n_gt = (s > v[:, None]).sum(axis=1)
            n_eq = (s == v[:, None]).sum(axis=1)
            for qi in np.nonzero((n_gt + n_eq > kk_local)
                                 & (v > -np.inf))[0]:
                gti = np.nonzero(s[qi] > v[qi])[0]
                eqi = np.nonzero(s[qi] == v[qi])[0]
                need = kk_local - len(gti)
                keep = eqi[np.argsort(nb[eqi], kind="stable")[:need]]
                top[qi] = np.concatenate([gti, keep])
            sv = np.take_along_axis(s, top, axis=1).ravel()
            res = pd.DataFrame({"query_id": np.repeat(ids, kk_local),
                                "neighbor_id": nb[top.ravel()],
                                "score": sv})
            # masked (non-probed / self) rows that slipped into a small
            # batch's top-take are dropped here, not emitted as -inf
            yield res[np.isfinite(sv)]

    cand = enc.mapInPandas(_batch_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    if rerank is None:
        return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id",
                        F.round("score", 6).alias("score"), "rank"))
    shortlist = (cand.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= rerank)
                 .select("query_id", "neighbor_id"))
    return _exact_rerank(df, queries, shortlist, k, vec_col, id_col,
                         shortlist_rows=len(qids) * rerank)


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup by cluster-then-prune (Abbas et al. 2023)
# ---------------------------------------------------------------------------

def sign_cell_expr(vec: Column, sign_bits: int = 6) -> Column:
    """Deterministic cluster id from the SIGNS of the first ``sign_bits``
    embedding dimensions — axis-aligned random-projection LSH (the
    hyperplanes are the coordinate axes, so the oracle can reproduce the
    cell id with plain SQL, unlike seeded-random hyperplanes). One pure
    projection."""
    bits = [
        (F.element_at(vec, d + 1) >= 0).cast("int") * F.lit(1 << d)
        for d in range(sign_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def semdedup_pairs(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id", threshold: float = 0.93,
                   sign_bits: int = 6,
                   strategy: str = "blas") -> DataFrame:
    """SemDeDup candidate pairs: embeddings are bucketed into 2^sign_bits
    sign-cells, and cosine similarity is computed ONLY within a cell —
    the cluster-then-prune shape of SemDeDup (Abbas et al. 2023), with
    k-means replaced by a deterministic LSH cell so results are exact,
    reproducible, and oracle-checkable (swap in ``label_centroids``
    cluster ids for the k-means variant without touching the join).

    Plan shape: ONE exchange keyed on the cell id; per-cell pair work is
    |cell|², bounded by the cell granularity you pick — at 100 TB you
    raise ``sign_bits`` so cells stay ~1e3-1e4 rows, keeping every
    task's work bounded while total work stays |corpus| x |cell| not
    |corpus|². Two physical strategies:

    - ``'blas'`` (default): one ``applyInPandas`` group per cell running
      a row-chunked numpy/BLAS matmul (chunks bound the similarity
      matrix to ~1024 x |cell| doubles per step). Measured ~15x the
      expression path at sf1 (200k x 64-d: 55s -> BLAS task-bound).
    - ``'expr'``: self-join + native zip_with cosine — whole-stage
      codegen, zero Python; right when cells are tiny or Arrow is off.

    Returns (id_a, id_b, cell, cosine >= threshold), id_a < id_b.
    """
    e = F.col(vec_col).cast("array<double>")
    cells = df.select(
        F.col(id_col), e.alias("_e"),
        sign_cell_expr(e, sign_bits).alias("cell"))
    if strategy == "expr":
        a = cells.select(F.col(id_col).alias("id_a"),
                         F.col("_e").alias("_ea"), "cell")
        b = cells.select(F.col(id_col).alias("id_b"),
                         F.col("_e").alias("_eb"), "cell")
        cos = F.round(cosine_expr(F.col("_ea"), F.col("_eb")), 6)
        return (a.join(b, "cell")
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("cosine", cos)
                .filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cell", "cosine"))
    if strategy != "blas":
        raise ValueError(f"unknown strategy {strategy!r}")
    import pandas as pd
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("id_a", id_type), T.StructField("id_b", id_type),
        T.StructField("cell", T.IntegerType()),
        T.StructField("cosine", T.DoubleType())])

    def cell_pairs(key, pdf):
        ids = pdf["_pid"].to_numpy()
        M = np.array(pdf["_e"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        M = M / nrm
        out_a, out_b, out_c = [], [], []
        for lo in range(0, len(ids), 1024):
            hi = min(lo + 1024, len(ids))
            cos = np.round(M[lo:hi] @ M.T, 6)
            ii, jj = np.where(cos >= threshold)
            ii = ii + lo
            keep = ids[ii] < ids[jj]
            out_a.append(ids[ii][keep])
            out_b.append(ids[jj][keep])
            out_c.append(cos[ii - lo, jj][keep])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
        return pd.DataFrame({
            "id_a": a,
            "id_b": np.concatenate(out_b) if out_b else a,
            "cell": np.full(len(a), key[0], dtype=np.int64),
            "cosine": np.concatenate(out_c) if out_c else
            np.array([], dtype=np.float64)})

    keyed = cells.select(F.col(id_col).alias("_pid"), "_e", "cell")
    return keyed.groupBy("cell").applyInPandas(cell_pairs, out_schema)


def semdedup_drops(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id", threshold: float = 0.93,
                   sign_bits: int = 6,
                   quality_col: str | None = None) -> DataFrame:
    """The SemDeDup drop set: for every intra-cell pair above the cosine
    threshold, drop the member with the LOWER quality (ties and the
    default no-quality case: drop the higher id — 'keep the first seen'
    convention). Distinct ids, one extra projection + distinct over
    ``semdedup_pairs``; anti-join the result against the corpus to
    apply. Deterministic regardless of partitioning."""
    pairs = semdedup_pairs(df, vec_col, id_col, threshold, sign_bits)
    if quality_col is None:
        victim = F.col("id_b")
    else:
        qa = df.select(F.col(id_col).alias("id_a"),
                       F.col(quality_col).alias("_qa"))
        qb = df.select(F.col(id_col).alias("id_b"),
                       F.col(quality_col).alias("_qb"))
        pairs = pairs.join(qa, "id_a").join(qb, "id_b")
        victim = F.when(F.col("_qa") < F.col("_qb"), F.col("id_a")) \
                  .otherwise(F.col("id_b"))
    return (pairs.select(victim.alias("dropped"))
            .distinct())
