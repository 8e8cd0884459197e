"""``.str`` accessor — pandas string methods as Spark Columns.

Re-derives reference ``handyspark/sql/string.py`` (which routed everything
through pandas UDFs). Native Spark expressions wherever the semantics match
pandas exactly (SURVEY.md §2.7 mapping table); Arrow pandas UDFs for the
unicode-classification / locale-ish remainder. All methods return a
``Column`` for use in ``assign``/``filter``.
"""
from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

from .series import _pandas_udf_method


class HandyString:
    def __init__(self, df, colname: str):
        self._df = df
        self._colname = colname
        self._col = F.col(colname)

    def _udf(self, method: str, returnType, **kwargs) -> Column:
        from .transform import HandyTransform
        return HandyTransform.gen_pandas_udf(
            self._df, lambda col: getattr(col.str, method)(**kwargs),
            args=(self._colname,), returnType=returnType)

    # -- boolean ------------------------------------------------------------
    def contains(self, pat: str, regex: bool = True) -> Column:
        return self._col.rlike(pat) if regex else self._col.contains(pat)

    def startswith(self, pat: str) -> Column:
        return self._col.startswith(pat)

    def endswith(self, pat: str) -> Column:
        return self._col.endswith(pat)

    def match(self, pat: str) -> Column:
        return self._col.rlike(f"^(?:{pat})")

    # unicode classification family: exact pandas/python semantics need
    # str.is*() per row -> pandas UDF
    def isalpha(self) -> Column:
        return self._udf("isalpha", "boolean")

    def isnumeric(self) -> Column:
        return self._udf("isnumeric", "boolean")

    def isalnum(self) -> Column:
        return self._udf("isalnum", "boolean")

    def isdigit(self) -> Column:
        return self._udf("isdigit", "boolean")

    def isdecimal(self) -> Column:
        return self._udf("isdecimal", "boolean")

    def isspace(self) -> Column:
        return self._udf("isspace", "boolean")

    def islower(self) -> Column:
        return self._udf("islower", "boolean")

    def isupper(self) -> Column:
        return self._udf("isupper", "boolean")

    def istitle(self) -> Column:
        return self._udf("istitle", "boolean")

    # -- string returns -----------------------------------------------------
    def lower(self) -> Column:
        return F.lower(self._col)

    def upper(self) -> Column:
        return F.upper(self._col)

    def title(self) -> Column:
        return self._udf("title", "string")   # initcap differs on "it's"

    def capitalize(self) -> Column:
        return F.concat(F.upper(F.substring(self._col, 1, 1)),
                        F.lower(F.expr(f"substring(`{self._colname}`, 2)")))

    def swapcase(self) -> Column:
        return self._udf("swapcase", "string")

    def replace(self, pat: str, repl: str, regex: bool = False) -> Column:
        # pandas>=2 defaults regex=False
        if regex:
            return F.regexp_replace(self._col, pat, repl)
        return F.replace(self._col, F.lit(pat), F.lit(repl))

    def strip(self, to_strip=None) -> Column:
        if to_strip is None:
            return F.trim(self._col)
        return F.expr(f"trim(BOTH '{to_strip}' FROM `{self._colname}`)")

    def lstrip(self, to_strip=None) -> Column:
        if to_strip is None:
            return F.ltrim(self._col)
        return F.expr(f"trim(LEADING '{to_strip}' FROM `{self._colname}`)")

    def rstrip(self, to_strip=None) -> Column:
        if to_strip is None:
            return F.rtrim(self._col)
        return F.expr(f"trim(TRAILING '{to_strip}' FROM `{self._colname}`)")

    def slice(self, start=None, stop=None, step=None) -> Column:
        if step not in (None, 1):
            return self._udf("slice", "string", start=start, stop=stop,
                             step=step)
        start = start or 0
        if start >= 0 and (stop is None or stop >= 0):
            length = (stop - start) if stop is not None else (1 << 30)
            return F.substring(self._col, start + 1, max(length, 0))
        return self._udf("slice", "string", start=start, stop=stop)

    def slice_replace(self, start=None, stop=None, repl=None) -> Column:
        return self._udf("slice_replace", "string", start=start, stop=stop,
                         repl=repl)

    def get(self, i: int) -> Column:
        if i >= 0:
            return F.substring(self._col, i + 1, 1)
        return F.substring(self._col, F.length(self._col) + F.lit(i + 1),
                           F.lit(1))

    def repeat(self, repeats: int) -> Column:
        return F.repeat(self._col, repeats)

    def pad(self, width: int, side: str = "left",
            fillchar: str = " ") -> Column:
        if side == "left":
            return F.lpad(self._col, width, fillchar)
        if side == "right":
            return F.rpad(self._col, width, fillchar)
        return self._udf("pad", "string", width=width, side=side,
                         fillchar=fillchar)

    def ljust(self, width: int, fillchar: str = " ") -> Column:
        return F.rpad(self._col, width, fillchar)   # pandas ljust pads right

    def rjust(self, width: int, fillchar: str = " ") -> Column:
        return F.lpad(self._col, width, fillchar)

    def center(self, width: int, fillchar: str = " ") -> Column:
        return self._udf("center", "string", width=width, fillchar=fillchar)

    def zfill(self, width: int) -> Column:
        return self._udf("zfill", "string", width=width)  # sign-aware

    def wrap(self, width: int, **kwargs) -> Column:
        return self._udf("wrap", "string", width=width, **kwargs)

    def join(self, sep: str) -> Column:
        return self._udf("join", "string", sep=sep)

    def translate(self, table: dict) -> Column:
        return self._udf("translate", "string", table=table)

    def normalize(self, form: str) -> Column:
        return self._udf("normalize", "string", form=form)

    def remove_accents(self) -> Column:
        """Reference custom method (string.py:22-29): strip combining marks
        after NFKD decomposition."""
        from .transform import HandyTransform
        return HandyTransform.gen_pandas_udf(
            self._df,
            lambda col: col.map(
                lambda s: "".join(
                    ch for ch in unicodedata.normalize("NFKD", s)
                    if not unicodedata.combining(ch))
                if s is not None else None),
            args=(self._colname,), returnType="string")

    # -- integer returns ----------------------------------------------------
    def count(self, pat: str) -> Column:
        return F.regexp_count(self._col, F.lit(pat)).cast("int")

    def len(self) -> Column:
        return F.length(self._col).cast("int")

    def find(self, sub: str) -> Column:
        return (F.instr(self._col, sub) - 1).cast("int")

    def rfind(self, sub: str) -> Column:
        return self._udf("rfind", "integer", sub=sub)

    # -- upgrades the reference lists as unsupported (string.py:12-13) ------
    def split(self, pat: str = " ", regex: bool = False) -> Column:
        import re
        return F.split(self._col, pat if regex else re.escape(pat))

    def extract(self, pat: str, group: int = 1) -> Column:
        return F.regexp_extract(self._col, pat, group)
