"""Schema utilities: semantic column taxonomy + python/numpy -> Spark schema.

Re-derives the semantics of the reference's ``_update_types``
(handyspark/sql/dataframe.py:202-211) and ``generate_schema``
(handyspark/sql/schema.py:25-61), fixing the reference's ``'boolan'`` typo
(dataframe.py:209): boolean columns ARE classified categorical here.
"""
from __future__ import annotations

import datetime
import decimal

import numpy as np
from pyspark.sql import types as T

# Spark typeName() -> semantic classes (SURVEY.md §1.2)
NUMERICAL = {"byte", "short", "integer", "long", "float", "double", "decimal"}
CONTINUOUS = {"double", "float", "decimal"}
CATEGORICAL = {"byte", "short", "integer", "long", "boolean", "string"}
ARRAY = {"array", "map"}
STRING = {"string"}


class ColumnTaxonomy:
    """Classify a DataFrame's columns into semantic groups.

    Mirrors reference ``Handy._update_types`` (dataframe.py:202-211) but is
    computed once per wrap from ``df.dtypes``-level metadata only (no jobs).
    """

    __slots__ = ("numerical", "continuous", "categorical", "array", "string",
                 "timestamp", "all")

    def __init__(self, schema: T.StructType):
        self.numerical: list[str] = []
        self.continuous: list[str] = []
        self.categorical: list[str] = []
        self.array: list[str] = []
        self.string: list[str] = []
        self.timestamp: list[str] = []
        self.all: list[str] = [f.name for f in schema.fields]
        for f in schema.fields:
            name = f.dataType.typeName()
            if name.startswith("decimal"):
                name = "decimal"
            if name in NUMERICAL:
                self.numerical.append(f.name)
            if name in CONTINUOUS:
                self.continuous.append(f.name)
            if name in CATEGORICAL:
                self.categorical.append(f.name)
            if name in ARRAY:
                self.array.append(f.name)
            if name in STRING:
                self.string.append(f.name)
            if name in ("timestamp", "timestamp_ntz", "date"):
                self.timestamp.append(f.name)

    def group(self, alias: str) -> list[str]:
        return getattr(self, alias)


COLTYPES = ("numerical", "continuous", "categorical", "array", "string",
            "timestamp")

# python/numpy type -> Spark type (reference handyspark/sql/schema.py:6-23,
# minus the deprecated np.bool/np.byte aliases)
_PY_TO_SPARK = {
    str: T.StringType(),
    bool: T.BooleanType(),
    int: T.LongType(),
    float: T.DoubleType(),
    bytes: T.BinaryType(),
    datetime.date: T.DateType(),
    datetime.datetime: T.TimestampType(),
    decimal.Decimal: T.DecimalType(38, 18),
    np.bool_: T.BooleanType(),
    np.int8: T.ByteType(),
    np.int16: T.ShortType(),
    np.int32: T.IntegerType(),
    np.int64: T.LongType(),
    np.float32: T.FloatType(),
    np.float64: T.DoubleType(),
    np.datetime64: T.TimestampType(),
    np.str_: T.StringType(),
}

_NAME_TO_SPARK = {
    "str": T.StringType(), "string": T.StringType(),
    "bool": T.BooleanType(), "boolean": T.BooleanType(),
    "int": T.LongType(), "long": T.LongType(), "bigint": T.LongType(),
    "integer": T.IntegerType(),
    "float": T.FloatType(), "double": T.DoubleType(),
    "date": T.DateType(), "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def spark_type_for(t) -> T.DataType:
    """Resolve a python/numpy type, type name string, or Spark DataType."""
    if isinstance(t, T.DataType):
        return t
    if isinstance(t, str):
        try:
            return T._parse_datatype_string(t)
        except Exception:
            if t in _NAME_TO_SPARK:
                return _NAME_TO_SPARK[t]
            raise
    if t in _PY_TO_SPARK:
        return _PY_TO_SPARK[t]
    # typing.List[int] style
    origin = getattr(t, "__origin__", None)
    if origin in (list, tuple):
        return T.ArrayType(spark_type_for(t.__args__[0]))
    if origin is dict:
        k, v = t.__args__
        return T.MapType(spark_type_for(k), spark_type_for(v))
    raise TypeError(f"cannot map {t!r} to a Spark type")


def generate_schema(columns: dict, nullable_columns="all") -> T.StructType:
    """Build a StructType from ``{name: python/numpy type}``.

    Reference: handyspark/sql/schema.py:25-61.
    """
    fields = []
    for name, t in columns.items():
        nullable = nullable_columns == "all" or name in (nullable_columns or [])
        fields.append(T.StructField(name, spark_type_for(t), nullable))
    return T.StructType(fields)
