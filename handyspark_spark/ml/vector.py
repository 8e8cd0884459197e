"""Vector/array column utilities.

Re-derives reference ``disassemble``/``dense_to_array``/``to_metrics_RDD``
(handyspark/util.py:140-190, dataframe.py:486-493) without the RDD round
trips: ``pyspark.ml.functions.vector_to_array`` + ``getItem`` projections,
all codegen-friendly.
"""
from __future__ import annotations

from pyspark.sql import functions as F


def _as_array(df, colname: str):
    """VectorUDT -> array<double>; arrays pass through."""
    dtype = dict(df.dtypes)[colname]
    if dtype.startswith("array"):
        return df, colname
    try:
        from pyspark.ml.functions import vector_to_array
        tmp = f"_arr_{colname}"
        return df.withColumn(tmp, vector_to_array(F.col(colname))), tmp
    except ImportError:  # pragma: no cover
        raise TypeError(f"column {colname} is not an array/vector")


def dense_to_array(hdf, colname: str, new_colname: str):
    from ..core.frame import HandyFrame
    df, arr = _as_array(hdf._df, colname)
    if arr != new_colname:
        df = df.withColumn(new_colname, F.col(arr))
        if arr.startswith("_arr_"):
            df = df.drop(arr)
    return HandyFrame(df, hdf._handy.copy())


def disassemble(hdf, colname: str, new_colnames=None):
    """Array column -> scalar columns ``col_0 .. col_{k-1}`` where k is the
    MINIMUM array size (reference semantics, util.py:158-190)."""
    from ..core.frame import HandyFrame
    df, arr = _as_array(hdf._df, colname)
    k = df.agg(F.min(F.size(F.col(arr))).alias("k")).collect()[0]["k"]
    if new_colnames is None:
        new_colnames = [f"{colname}_{i}" for i in range(k)]
    out = df.select("*", *[F.col(arr)[i].alias(new_colnames[i])
                           for i in range(k)])
    if arr != colname:
        out = out.drop(arr)
    return HandyFrame(out, hdf._handy.copy())


def to_metrics_rdd(hdf, prob_col: str = "probability",
                   label_col: str = "label"):
    """(score, label) pair RDD for mllib-style metrics
    (ref dataframe.py:491-493); score = P(class 1)."""
    df, arr = _as_array(hdf._df, prob_col)
    return (df.select(F.col(arr)[1].cast("double").alias("score"),
                      F.col(label_col).cast("double").alias("label"))
              .rdd.map(tuple))
