"""Diagnostics: Spark traceback summarization + plan introspection.

Re-derives reference ``handyspark/util.py:42-92`` (``HandyException`` with
a bold-red summary line extracted from the multi-hundred-line JVM
traceback) and the ``stages`` proxy metric — reimplemented on the SQL
executed plan instead of RDD debug strings (dataframe.py:112-116)."""
from __future__ import annotations

import re

ANSI_BOLD_RED = "\033[1;31m"
ANSI_RESET = "\033[0m"


class HandyException(Exception):
    """Wraps a Spark exception with the root-cause line surfaced first."""

    def __init__(self, exc: BaseException):
        self.summary = summarize_spark_error(str(exc))
        super().__init__(f"{ANSI_BOLD_RED}{self.summary}{ANSI_RESET}\n"
                         f"{exc}")


_PATTERNS = [
    re.compile(r"^(pyspark\.errors\.[\w.]+: .+)$", re.M),
    re.compile(r"^([\w.]*AnalysisException: .+)$", re.M),
    re.compile(r"^(\w+Error: .+)$", re.M),
    re.compile(r"Caused by: ([^\n]+)"),
]


def summarize_spark_error(text: str) -> str:
    """First match of the root-cause patterns, else the first line."""
    for pat in _PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(1).strip()
    return text.strip().splitlines()[0] if text.strip() else "unknown error"


def exchange_count(df) -> int:
    """Number of shuffle exchanges in the executed physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def explain_str(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)
