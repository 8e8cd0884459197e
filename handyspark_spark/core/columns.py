"""HandyColumns — pandas-style column selection + statistics accessor.

Re-derives reference ``HandyColumns`` (handyspark/sql/dataframe.py:987-1781):
``hdf.cols['Fare'][:5]`` head-fetch, semantic-taxonomy aliases
(``hdf.cols['continuous']``), and the statistics surface (mean/median/...)
that executes ONE Spark aggregation and ships only the summary to pandas.

Head-fetch uses ``limit(n).toPandas()`` under Arrow — the reference's
``rdd.map(itemgetter(0)).take(n)`` detour (dataframe.py:213-223) is an
anti-pattern on modern Spark.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..core.schema import COLTYPES
from ..operators import agg as A


class HandyColumns:
    def __init__(self, hdf, colnames: list[str] | None = None,
                 single: bool = False, strata: list[str] | None = None):
        self._hdf = hdf
        self._df = hdf._df
        self._colnames = colnames
        self._single = single
        self._strata = strata or []

    # -- selection ----------------------------------------------------------
    def __getitem__(self, item):
        if self._colnames is None:
            if isinstance(item, tuple) and len(item) == 2:
                return self[item[0]][item[1]]
            if isinstance(item, slice):       # hdf.cols[:] / [:n] = all cols
                return HandyColumns(self._hdf, list(self._df.columns),
                                    strata=self._strata)[item] \
                    if item != slice(None) else \
                    HandyColumns(self._hdf, list(self._df.columns),
                                 strata=self._strata)
            if isinstance(item, str):
                if item in COLTYPES:          # taxonomy alias
                    cols = self._hdf._types.group(item)
                    return HandyColumns(self._hdf, cols, strata=self._strata)
                self._check([item])
                return HandyColumns(self._hdf, [item], single=True,
                                    strata=self._strata)
            if isinstance(item, int):
                return HandyColumns(self._hdf, [self._df.columns[item]],
                                    single=True, strata=self._strata)
            item = list(item)
            self._check(item)
            return HandyColumns(self._hdf, item, strata=self._strata)
        # columns already chosen -> integer/slice = head-fetch
        if isinstance(item, slice):
            n = item.stop if item.stop is not None else 20
            pdf = (self._df.select(self._colnames).limit(n).toPandas())
            if self._single:
                return pdf[self._colnames[0]]
            return pdf
        if isinstance(item, int):
            return self[:item]
        raise KeyError(item)

    def _check(self, cols):
        missing = [c for c in cols if c not in self._df.columns]
        if missing:
            raise ValueError(f"columns {missing} not in {self._df.columns}")

    @property
    def numerical(self):
        return HandyColumns(self._hdf, self._hdf._types.numerical,
                            strata=self._strata)

    @property
    def continuous(self):
        return HandyColumns(self._hdf, self._hdf._types.continuous,
                            strata=self._strata)

    @property
    def categorical(self):
        return HandyColumns(self._hdf, self._hdf._types.categorical,
                            strata=self._strata)

    @property
    def string(self):
        return HandyColumns(self._hdf, self._hdf._types.string,
                            strata=self._strata)

    @property
    def array(self):
        return HandyColumns(self._hdf, self._hdf._types.array,
                            strata=self._strata)

    # -- shaping ------------------------------------------------------------
    def _cols(self) -> list[str]:
        return (self._colnames if self._colnames is not None
                else list(self._df.columns))

    def _shape(self, pdf: pd.DataFrame, name: str):
        """One-row wide agg result -> scalar (single col) or named Series."""
        nstrata = len(self._strata)
        if nstrata:
            pdf = pdf.set_index(self._strata).sort_index()
            if self._single:
                s = pdf[self._cols()[0]]
                s.name = self._cols()[0]
                return s
            return pdf
        s = pdf.iloc[0]
        s.name = name
        if self._single:
            return s.iloc[0]
        return s

    def _agg(self, name: str, fn) -> pd.Series | float:
        cols = self._cols()
        exprs = [fn(c).alias(c) for c in cols]
        pdf = A.summary_plan(self._df, exprs, self._strata or None).toPandas()
        return self._shape(pdf, name)

    # -- statistics (ref dataframe.py:736-776, §2.4) ------------------------
    def mean(self):
        return self._agg("mean", lambda c: F.mean(F.col(c).cast("double")))

    def min(self):
        return self._agg("min", lambda c: F.min(c))

    def max(self):
        return self._agg("max", lambda c: F.max(c))

    def sum(self):
        return self._agg("sum", lambda c: F.sum(c))

    def count(self):
        return self._agg("count", lambda c: F.count(c))

    def stddev(self):
        return self._agg("stddev", lambda c: F.stddev(c))

    def var(self):
        # reference computed stddev**2 in pandas (dataframe.py:766-768);
        # native F.variance is both exact and one fewer round-trip
        return self._agg("var", lambda c: F.variance(c))

    def percentile(self, perc, precision: float = 0.01, exact: bool = False):
        q = perc / 100.0 if perc > 1 else perc
        return self._agg(f"percentile_{perc}",
                         lambda c: A.percentile_expr(c, q, precision, exact))

    def median(self, precision: float = 0.01, exact: bool = False):
        return self.percentile(0.5, precision, exact)

    def q1(self, precision: float = 0.01, exact: bool = False):
        return self.percentile(0.25, precision, exact)

    def q3(self, precision: float = 0.01, exact: bool = False):
        return self.percentile(0.75, precision, exact)

    def nunique(self, exact: bool = False):
        pdf = A.nunique_plan(self._df, self._cols(), self._strata or None,
                             exact=exact).toPandas()
        return self._shape(pdf, "nunique")

    def isnull(self, ratio: bool = False):
        pdf = A.isnull_plan(self._df, self._cols(), ratio,
                            self._strata or None).toPandas()
        return self._shape(pdf, "missing" + ("(ratio)" if ratio else ""))

    def value_counts(self, dropna: bool = True, ascending: bool = False):
        col = self._cols()[0]
        pdf = A.value_counts_plan(self._df, [col], self._strata or None,
                                  dropna).toPandas()
        pdf = pdf.set_index((self._strata or []) + [col])["count"]
        pdf = pdf.sort_values(ascending=ascending)
        pdf.name = col
        return pdf

    def mode(self):
        col = self._cols()[0]
        pdf = A.mode_plan(self._df, col, self._strata or None).toPandas()
        if self._strata:
            return pdf.set_index(self._strata)[col]
        return pdf[col].iloc[0]

    def entropy(self):
        pdf = A.entropy_plan(self._df, self._cols(),
                             self._strata or None).toPandas()
        if self._strata:
            return pdf.set_index(self._strata + ["colname"])["entropy"]
        s = pdf.set_index("colname")["entropy"]
        s.name = "entropy"
        if self._single:
            return s.iloc[0]
        return s

    def mutual_info(self) -> pd.DataFrame:
        cols = self._cols()
        mat = pd.DataFrame(0.0, index=cols, columns=cols)
        for i, cx in enumerate(cols):
            ent = A.entropy_plan(self._df, [cx]).toPandas()
            mat.loc[cx, cx] = ent["entropy"].iloc[0]
            for cy in cols[i + 1:]:
                mi = A.mutual_info_plan(self._df, cx, cy).toPandas()
                v = mi["mutual_info"].iloc[0]
                mat.loc[cx, cy] = mat.loc[cy, cx] = v
        return mat

    def corr(self, method: str = "pearson") -> pd.DataFrame:
        cols = self._cols()
        long = A.corr_plan(self._df, cols, method).toPandas()
        mat = pd.DataFrame(1.0, index=cols, columns=cols)
        for _, r in long.iterrows():
            mat.loc[r.col_x, r.col_y] = mat.loc[r.col_y, r.col_x] = r["corr"]
        return mat

    # -- plot statistics (handyspark_spark.plans.plotstats) -----------------
    def hist(self, bins: int = 10, **kwargs):
        from ..plans.plotstats import hist_stats
        return hist_stats(self._hdf, self._cols()[0], bins,
                          strata=self._strata or None)

    def boxplot(self, k: float = 1.5, **kwargs):
        from ..plans.plotstats import boxplot_stats
        return boxplot_stats(self._hdf, self._cols(), k,
                             strata=self._strata or None)

    def scatterplot(self, bins: int = 30, **kwargs):
        from ..plans.plotstats import scatterplot_stats
        cols = self._cols()
        return scatterplot_stats(self._hdf, cols[0], cols[1], bins,
                                 strata=self._strata or None)


class HandyGrouped:
    """Wrap GroupedData.agg so the result remembers its group columns
    (ref dataframe.py:841-855): the returned HandyFrame carries
    ``_group_cols`` so `cols[...]` consumers can index by them."""

    def __init__(self, gdata, cols, handy=None):
        self._gdata = gdata
        self._group_cols = list(cols)
        self._handy = handy

    def agg(self, *exprs):
        from .frame import HandyFrame
        out = HandyFrame(self._gdata.agg(*exprs),
                         self._handy.copy() if self._handy else None)
        out._group_cols = self._group_cols
        return out

    def __getattr__(self, name):
        return getattr(self._gdata, name)
