"""``.dt`` accessor — pandas datetime methods/properties as Spark Columns.

Re-derives reference ``handyspark/sql/datetime.py`` with native Spark
datetime expressions for every property that has an exact equivalent
(SURVEY.md §2.7); pandas conventions are matched explicitly where Spark's
differ (e.g. ``dayofweek``: pandas Monday=0 vs Spark Sunday=1).
Properties are exposed as zero-arg methods AND as python properties where
the reference used properties.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pandas strftime directive -> JDK DateTimeFormatter pattern
_STRFTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%j": "DDD",
    "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM", "%p": "a",
    "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i:i + 2]
            if tok in _STRFTIME:
                out.append(_STRFTIME[tok])
                i += 2
                continue
        ch = fmt[i]
        # literal latin letters must be quoted in JDK patterns
        out.append(f"'{ch}'" if ch.isalpha() else ch)
        i += 1
    return "".join(out)


class HandyDatetime:
    def __init__(self, df, colname: str):
        self._df = df
        self._colname = colname
        self._col = F.col(colname)

    def _udf(self, attr: str, returnType, call: bool = False,
             **kwargs) -> Column:
        from .transform import HandyTransform
        if call:
            fn = lambda col: getattr(col.dt, attr)(**kwargs)
        else:
            fn = lambda col: getattr(col.dt, attr)
        return HandyTransform.gen_pandas_udf(self._df, fn,
                                             args=(self._colname,),
                                             returnType=returnType)

    # -- integer properties -------------------------------------------------
    @property
    def year(self) -> Column:
        return F.year(self._col).cast("int")

    @property
    def month(self) -> Column:
        return F.month(self._col).cast("int")

    @property
    def day(self) -> Column:
        return F.dayofmonth(self._col).cast("int")

    @property
    def hour(self) -> Column:
        return F.hour(self._col).cast("int")

    @property
    def minute(self) -> Column:
        return F.minute(self._col).cast("int")

    @property
    def second(self) -> Column:
        return F.second(self._col).cast("int")

    @property
    def microsecond(self) -> Column:
        return (F.unix_micros(self._col) % 1_000_000).cast("int")

    @property
    def nanosecond(self) -> Column:
        return ((F.unix_micros(self._col) % 1_000_000) * 1000 % 1000) \
            .cast("int")

    @property
    def quarter(self) -> Column:
        return F.quarter(self._col).cast("int")

    @property
    def dayofweek(self) -> Column:
        # pandas: Monday=0 .. Sunday=6; Spark dayofweek: Sunday=1 .. Saturday=7
        return ((F.dayofweek(self._col) + 5) % 7).cast("int")

    weekday = dayofweek

    @property
    def dayofyear(self) -> Column:
        return F.dayofyear(self._col).cast("int")

    @property
    def daysinmonth(self) -> Column:
        return F.dayofmonth(F.last_day(self._col)).cast("int")

    days_in_month = daysinmonth

    @property
    def weekofyear(self) -> Column:
        return F.weekofyear(self._col).cast("int")   # ISO week, like pandas

    week = weekofyear

    # -- boolean properties -------------------------------------------------
    @property
    def is_leap_year(self) -> Column:
        y = F.year(self._col)
        return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))

    @property
    def is_month_start(self) -> Column:
        return F.dayofmonth(self._col) == 1

    @property
    def is_month_end(self) -> Column:
        return F.to_date(self._col) == F.last_day(self._col)

    @property
    def is_quarter_start(self) -> Column:
        return (F.dayofmonth(self._col) == 1) & \
            F.month(self._col).isin([1, 4, 7, 10])

    @property
    def is_quarter_end(self) -> Column:
        return (F.to_date(self._col) == F.last_day(self._col)) & \
            F.month(self._col).isin([3, 6, 9, 12])

    @property
    def is_year_start(self) -> Column:
        return (F.dayofmonth(self._col) == 1) & (F.month(self._col) == 1)

    @property
    def is_year_end(self) -> Column:
        return (F.dayofmonth(self._col) == 31) & (F.month(self._col) == 12)

    # -- string / date ------------------------------------------------------
    def strftime(self, date_format: str) -> Column:
        return F.date_format(self._col, strftime_to_java(date_format))

    @property
    def weekday_name(self) -> Column:
        return F.date_format(self._col, "EEEE")

    day_name = weekday_name

    @property
    def date(self) -> Column:
        return F.to_date(self._col)

    @property
    def time(self) -> Column:
        return F.date_format(self._col, "HH:mm:ss")

    @property
    def tz(self) -> Column:
        return self._udf("tz", "string")

    # -- timestamp functions ------------------------------------------------
    def normalize(self) -> Column:
        return F.date_trunc("day", self._col)

    def floor(self, freq: str) -> Column:
        unit = {"D": "day", "H": "hour", "T": "minute", "min": "minute",
                "S": "second"}.get(freq, freq.lower())
        return F.date_trunc(unit, self._col)

    def ceil(self, freq: str) -> Column:
        return self._udf("ceil", "timestamp", call=True, freq=freq)

    def round(self, freq: str) -> Column:
        return self._udf("round", "timestamp", call=True, freq=freq)

    def tz_localize(self, tz: str) -> Column:
        return self._udf("tz_localize", "timestamp", call=True, tz=tz)

    def tz_convert(self, tz: str) -> Column:
        return self._udf("tz_convert", "timestamp", call=True, tz=tz)
