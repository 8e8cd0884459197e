"""Ordered-window Series operations — the upgrade over the reference's
blacklist.

The reference REFUSES ``rank, cumsum, diff, shift, pct_change, ffill,
bfill, cummax, cummin, cumprod, interpolate`` (sql/pandas.py:11-12)
because a scalar pandas UDF sees one partition — an honest limitation it
never solved. Here they're implemented properly with ``Window`` over an
EXPLICIT ordering column (required — Spark DataFrames have no implicit row
order), partitionable for scale.

Usage: ``hdf.ordered(by='ts', partition='user_id')['value'].cumsum()``
returns a Column for ``assign``.
"""
from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


class OrderedSeries:
    def __init__(self, colname: str, order_by, partition_by=None,
                 dtype: str | None = None):
        self._col = F.col(colname)
        self._dtype = dtype
        order_by = [order_by] if isinstance(order_by, str) else list(order_by)
        self._order = [F.col(c) for c in order_by]
        part = ([partition_by] if isinstance(partition_by, str)
                else list(partition_by or []))
        self._part = [F.col(c) for c in part]

    def _w(self) -> WindowSpec:
        return Window.partitionBy(*self._part).orderBy(*self._order)

    def _cum(self) -> WindowSpec:
        return self._w().rowsBetween(Window.unboundedPreceding, 0)

    def cumsum(self) -> Column:
        return F.sum(self._col).over(self._cum())

    def cummax(self) -> Column:
        return F.max(self._col).over(self._cum())

    def cummin(self) -> Column:
        return F.min(self._col).over(self._cum())

    def cumprod(self) -> Column:
        # product via exp-sum-log with sign tracking
        negs = F.sum(F.when(self._col < 0, 1).otherwise(0)).over(self._cum())
        zero = F.max(F.when(self._col == 0, 1).otherwise(0)) \
            .over(self._cum())
        mag = F.exp(F.sum(F.log(F.abs(self._col))).over(self._cum()))
        sign = F.when(negs % 2 == 1, -1.0).otherwise(1.0)
        return F.when(zero == 1, F.lit(0.0)).otherwise(sign * mag)

    def cumcount(self) -> Column:
        return F.count(self._col).over(self._cum())

    def shift(self, periods: int = 1) -> Column:
        if periods >= 0:
            return F.lag(self._col, periods).over(self._w())
        return F.lead(self._col, -periods).over(self._w())

    def diff(self, periods: int = 1) -> Column:
        return self._col - self.shift(periods)

    def pct_change(self, periods: int = 1) -> Column:
        prev = self.shift(periods)
        return (self._col - prev) / prev

    def rank(self, method: str = "min", ascending: bool = True) -> Column:
        order = [c.asc() if ascending else c.desc() for c in [self._col]]
        w = Window.partitionBy(*self._part).orderBy(*order)
        if method == "min":
            return F.rank().over(w)
        if method == "dense":
            return F.dense_rank().over(w)
        if method == "first":
            return F.row_number().over(w)
        if method == "average":
            # pandas default: average of min/max rank over ties
            rmin = F.rank().over(w)
            cnt = F.count(F.lit(1)).over(
                Window.partitionBy(*self._part, self._col))
            return (rmin + (cnt - 1) / 2.0).cast("double")
        raise ValueError(f"unsupported method {method!r}")

    def _known(self) -> Column:
        """The column with NaN masked to NULL — pandas treats NaN as
        missing, and Spark frames ingested WITHOUT Arrow carry pandas
        NaNs as NaN doubles rather than NULLs. NOTE: Spark's NaN
        semantics make ``x != x`` FALSE for NaN (NaN equals NaN in
        Spark SQL), so the test must be ``isnan`` — gated on the FLOAT
        dtypes only (a cast-based test would also destroy the literal
        string 'NaN' in string columns). Same missing-definition as
        ``operators.agg.nan_to_null`` / ``operators.fill._is_missing``."""
        if self._dtype not in ("double", "float"):
            return self._col
        return F.when(self._col.isNotNull() & ~F.isnan(self._col),
                      self._col)

    def ffill(self) -> Column:
        return F.last(self._known(), ignorenulls=True).over(self._cum())

    def bfill(self) -> Column:
        w = self._w().rowsBetween(0, Window.unboundedFollowing)
        return F.first(self._known(), ignorenulls=True).over(w)

    def interpolate(self) -> Column:
        """Linear interpolation of interior nulls (pandas
        ``interpolate(method='linear')`` over the explicit order): for a
        null run between known values a..b, the k-th null gets
        a + (b - a) * k / (gap + 1). Leading nulls stay null, trailing
        nulls carry the last value forward (pandas default
        limit_direction 'forward')."""
        w = self._w()
        known = self._known()           # NaN masked to NULL, see _known
        pos = F.row_number().over(w)
        cum = self._cum()
        fwd = self._w().rowsBetween(0, Window.unboundedFollowing)
        prev_val = F.last(known, ignorenulls=True).over(cum)
        next_val = F.first(known, ignorenulls=True).over(fwd)
        prev_pos = F.last(F.when(known.isNotNull(), pos),
                          ignorenulls=True).over(cum)
        next_pos = F.first(F.when(known.isNotNull(), pos),
                           ignorenulls=True).over(fwd)
        frac = (pos - prev_pos).cast("double") / (next_pos - prev_pos)
        interp = prev_val + (next_val - prev_val) * frac
        return (F.when(known.isNotNull(), self._col)
                 .when(prev_val.isNull(), F.lit(None))     # leading gaps
                 .when(next_val.isNull(), prev_val)        # trailing: ffill
                 .otherwise(interp))


    def rolling_mean(self, window: int) -> Column:
        return F.avg(self._col).over(
            self._w().rowsBetween(-(window - 1), 0))

    def rolling_sum(self, window: int) -> Column:
        return F.sum(self._col).over(
            self._w().rowsBetween(-(window - 1), 0))

    def rolling_min(self, window: int) -> Column:
        return F.min(self._col).over(
            self._w().rowsBetween(-(window - 1), 0))

    def rolling_max(self, window: int) -> Column:
        return F.max(self._col).over(
            self._w().rowsBetween(-(window - 1), 0))


    def _time_w(self, seconds: int):
        return (Window.partitionBy(*self._part)
                .orderBy(self._order[0].cast("double"))
                .rangeBetween(-seconds, 0))

    def rolling_mean_time(self, seconds: int) -> Column:
        """Time-based trailing mean over ``seconds`` of event time —
        ``rangeBetween`` over the epoch-seconds order column (the order-by
        column must be a timestamp). Window is CLOSED on both ends
        [t - seconds, t]; pandas ``rolling('Ns')`` is left-open
        (t - N, t] — rows exactly N seconds back differ. NaN is treated
        as missing (``_known``), like every fill/rolling op here."""
        return F.avg(self._known()).over(self._time_w(seconds))

    def rolling_sum_time(self, seconds: int) -> Column:
        return F.sum(self._known()).over(self._time_w(seconds))

    def rolling_count_time(self, seconds: int) -> Column:
        return F.count(self._known()).over(self._time_w(seconds))


class OrderedAccessor:
    """``hdf.ordered(by=..., partition=...)['col']``."""

    def __init__(self, hdf, by, partition=None):
        self._hdf = hdf
        self._by = by
        self._partition = partition

    def __getitem__(self, colname: str) -> OrderedSeries:
        if colname not in self._hdf._df.columns:
            raise ValueError(f"column {colname!r} not found")
        return OrderedSeries(colname, self._by, self._partition,
                             dtype=dict(self._hdf._df.dtypes)[colname])
