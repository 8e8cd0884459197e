"""handyspark_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dvgodoy/handyspark, re-expressed Spark-first
(DataFrame/SQL/Catalyst), plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Reference semantics: /root/reference (dvgodoy/handyspark) — see SURVEY.md.
"""
from .core.frame import Handy, HandyFrame, toHandy, install
from .core.schema import generate_schema
from .operators.strata import Bucket, Quantile

__version__ = "0.1.0"
__all__ = ["Handy", "HandyFrame", "toHandy", "install", "generate_schema",
           "Bucket", "Quantile"]

install()
