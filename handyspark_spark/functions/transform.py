"""HandyTransform — the pandas-UDF autowiring layer.

Re-derives reference ``handyspark/sql/transform.py``: wrap a plain python
function whose *argument names are column names* into an Arrow-vectorized
scalar pandas UDF, with return-type resolution precedence:

1. explicit ``returnType=`` string / DataType;
2. ``TypeName.ret(f)`` annotation tuple (reference extensions/types.py);
3. python type annotations (incl. ``list[int]`` -> ``array<int>``);
4. default: the Spark dtype of the first argument column
   (reference transform.py:26-32).

No row-at-a-time ``F.udf`` fallback — Arrow is standard on Spark 3+/4
(the reference's fallback existed for pyarrow-less Spark 2.3 installs).
"""
from __future__ import annotations

import inspect

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.schema import spark_type_for


def ret(returnType):
    """Attach a Spark return type to a function:
    ``ret('array<double>')(lambda x: ...)`` — plays the role of the
    reference's ``TypeName.ret`` extension (extensions/types.py:3-17)."""
    def wrapper(f):
        f.__spark_return_type__ = spark_type_for(returnType)
        return f
    return wrapper


def _infer_return_type(df: DataFrame, f, args: tuple[str, ...],
                       returnType) -> T.DataType:
    if returnType is not None:
        return spark_type_for(returnType)
    if hasattr(f, "__spark_return_type__"):
        return f.__spark_return_type__
    ann = getattr(f, "__annotations__", {}) or {}
    if "return" in ann and ann["return"] is not None:
        return spark_type_for(ann["return"])
    # default: dtype of the first argument column
    first = args[0]
    return df.schema[first].dataType


def _arg_names(f, args=None) -> tuple[str, ...]:
    if args is not None:
        return tuple([args] if isinstance(args, str) else args)
    return tuple(inspect.signature(f).parameters)


class HandyTransform:
    @staticmethod
    def gen_pandas_udf(df: DataFrame, f, args=None, returnType=None) -> Column:
        names = _arg_names(f, args)
        rtype = _infer_return_type(df, f, names, returnType)

        @F.pandas_udf(rtype)
        def _udf(*cols: pd.Series) -> pd.Series:
            return f(*cols)

        return _udf(*[F.col(c) for c in names])

    @staticmethod
    def transform(df: DataFrame, f, name=None, args=None,
                  returnType=None) -> DataFrame:
        if name is None:
            name = _arg_names(f, args)[0]
        return df.withColumn(
            name, HandyTransform.gen_pandas_udf(df, f, args, returnType))

    @staticmethod
    def apply(df: DataFrame, f, name=None, args=None,
              returnType=None) -> DataFrame:
        if name is None:
            name = _arg_names(f, args)[0]
        return df.select(
            HandyTransform.gen_pandas_udf(df, f, args, returnType).alias(name))

    @staticmethod
    def assign(df: DataFrame, **kwargs) -> DataFrame:
        """pandas-style multi-column assign: callables become pandas UDFs,
        Columns pass through, scalars become literals."""
        out = df
        for name, v in kwargs.items():
            if callable(v):
                out = out.withColumn(
                    name, HandyTransform.gen_pandas_udf(out, v))
            elif isinstance(v, Column):
                out = out.withColumn(name, v)
            else:
                out = out.withColumn(name, F.lit(v))
        return out
