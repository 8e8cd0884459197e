"""handyspark_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dvgodoy/handyspark, re-expressed Spark-first
(DataFrame/SQL/Catalyst), plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Reference semantics: /root/reference (dvgodoy/handyspark) — see SURVEY.md.
"""
# Minimum Spark: 3.5 (F.unix_micros / F.replace in the .dt/.str
# accessors, applyInPandasWithState in streaming). Checked once here so
# an older runtime fails with one clear message instead of scattered
# AttributeErrors deep inside accessor calls.
MIN_SPARK = (3, 5)


def _check_spark_version():
    import pyspark
    ver = tuple(int(p) for p in pyspark.__version__.split(".")[:2])
    if ver < MIN_SPARK:
        raise ImportError(
            f"handyspark_spark requires pyspark >= "
            f"{'.'.join(map(str, MIN_SPARK))} "
            f"(found {pyspark.__version__}): the .dt/.str accessors use "
            f"unix_micros/replace and streaming uses "
            f"applyInPandasWithState, all added in 3.5")


_check_spark_version()

from .core.frame import Handy, HandyFrame, toHandy, install
from .core.schema import generate_schema
from .operators.strata import Bucket, Quantile

__version__ = "0.1.0"
__all__ = ["Handy", "HandyFrame", "toHandy", "install", "generate_schema",
           "Bucket", "Quantile"]

install()
