"""The 100-TB ANN production layout, end to end on local fixtures.

    python examples/ann_production_layout.py [sf_dir]

The shape this demonstrates (pipeline/similarity.py + ann_index.py):

1. TRAIN ONCE — fit IVF-PQ (coarse centroids + residual codebooks) on
   a bounded sample; persist the few-KB index with ``IVFPQIndex.save``.
2. ENCODE ONCE — add (cell, residual code) to every corpus row with the
   FROZEN index and write it ``partitionBy("cell")``: probes then prune
   at the FILE level (read nprobe/n_centroids of the bytes) and searches
   scan codes (|docs| x m small ints), never raw vectors.
3. SEARCH MANY — per query batch: load the index, read the encoded
   layout, ``search(..., encoded=...)`` with a small ``nprobe`` and an
   exact-cosine ``rerank`` of only the shortlisted rows.

New corpus batches keep using the frozen index (codes stay comparable),
so step 2 is incremental — encode and append new partitions only.
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from handyspark_spark.sources.loader import load_table
from handyspark_spark.pipeline.ann_index import IVFPQIndex


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .appName("ann-production-layout")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="ann_layout_")

    # 1. train once, persist the index artifact
    idx = IVFPQIndex.fit(corpus, n_centroids=16, m=16, nbits=4)
    idx.save(f"{root}/index", spark)
    print(f"index: {idx.centroids.shape[0]} cells, "
          f"books {idx.books.shape} -> {root}/index")

    # 2. encode once, write partitioned by cell
    idx2 = IVFPQIndex.load(spark, f"{root}/index")
    idx2.encode(corpus).write.partitionBy("cell") \
        .parquet(f"{root}/corpus_by_cell")
    print(f"encoded corpus -> {root}/corpus_by_cell "
          f"({len(os.listdir(f'{root}/corpus_by_cell'))} entries)")

    # 3. search many: codes scanned, raw vectors touched only for the
    #    reranked shortlist
    encoded = spark.read.parquet(f"{root}/corpus_by_cell")
    queries = corpus.filter(F.col("vec_id") < 4)
    hits = idx2.search(corpus, queries, k=3, nprobe=4, rerank=30,
                       encoded=encoded)
    hits.show(12, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
