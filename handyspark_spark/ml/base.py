"""Serializable imputation/fencing transformers.

Re-derives reference ``handyspark/ml/base.py``: the fitted clause-keyed
stats dict from ``HandyFrame.fill``/``fence`` is exported as a
``pyspark.ml.Transformer`` whose single Param is the dict as JSON —
save/load-able and usable inside a ``pyspark.ml.Pipeline`` (the
train/production bridge, SURVEY.md §3.4).
"""
from __future__ import annotations

import json

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import functions as F


class HasStatsDict(Params):
    statsDict = Param(Params._dummy(), "statsDict",
                      "fitted statistics as a JSON string",
                      typeConverter=TypeConverters.toString)

    def setStatsDict(self, value: dict):
        return self._set(statsDict=json.dumps(value))

    def getStatsDict(self) -> dict:
        return json.loads(self.getOrDefault(self.statsDict))


def _clause_condition(clause: str):
    """Clause strings are valid SQL predicates by construction
    ('Pclass == "1" and Sex == "male"', 'Fare >= 0.0 and Fare < 100.0')."""
    return F.expr(clause.replace('"', "'"))


class HandyImputer(Transformer, HasStatsDict, DefaultParamsReadable,
                   DefaultParamsWritable):
    """Applies fitted fill values (ref ml/base.py:62-106).

    Flat dict -> global imputation; nested {clause: {col: value}} ->
    per-stratum CASE projection. Map-only, no shuffle."""

    @keyword_only
    def __init__(self, statsDict: dict | None = None):
        super().__init__()
        if statsDict is not None:
            self.setStatsDict(statsDict)

    def _transform(self, df):
        stats = self.getStatsDict()
        dtypes = dict(df.dtypes)

        def missing(c):
            cond = F.isnull(F.col(c))
            if dtypes.get(c) in ("double", "float"):
                cond = cond | F.isnan(F.col(c))
            return cond

        nested = any(isinstance(v, dict) for v in stats.values())
        out = df
        if not nested:
            for c, v in stats.items():
                out = out.withColumn(c, F.when(missing(c), F.lit(v))
                                     .otherwise(F.col(c)))
        else:
            cols = sorted({c for d in stats.values() for c in d})
            for c in cols:
                vexpr = None
                for clause, d in stats.items():
                    if c not in d:
                        continue
                    cond = _clause_condition(clause)
                    vexpr = (F.when(cond, F.lit(d[c])) if vexpr is None
                             else vexpr.when(cond, F.lit(d[c])))
                out = out.withColumn(c, F.when(missing(c), vexpr)
                                     .otherwise(F.col(c)))
        return out


class HandyFencer(Transformer, HasStatsDict, DefaultParamsReadable,
                  DefaultParamsWritable):
    """Applies fitted Tukey fences (ref ml/base.py:109-156)."""

    @keyword_only
    def __init__(self, statsDict: dict | None = None):
        super().__init__()
        if statsDict is not None:
            self.setStatsDict(statsDict)

    def _transform(self, df):
        stats = self.getStatsDict()
        nested = any(isinstance(v, dict) for v in stats.values())
        out = df
        if not nested:
            for c, (lf, uf) in stats.items():
                out = out.withColumn(
                    c, F.greatest(F.lit(lf),
                                  F.least(F.lit(uf),
                                          F.col(c).cast("double"))))
        else:
            cols = sorted({c for d in stats.values() for c in d})
            for c in cols:
                lexpr, uexpr = None, None
                for clause, d in stats.items():
                    if c not in d:
                        continue
                    lf, uf = d[c]
                    cond = _clause_condition(clause)
                    lexpr = (F.when(cond, F.lit(lf)) if lexpr is None
                             else lexpr.when(cond, F.lit(lf)))
                    uexpr = (F.when(cond, F.lit(uf)) if uexpr is None
                             else uexpr.when(cond, F.lit(uf)))
                out = out.withColumn(
                    c, F.greatest(lexpr, F.least(uexpr,
                                                 F.col(c).cast("double"))))
        return out


class HandyTransformers:
    """``hdf.transformers.imputer()/.fencer()`` factory
    (ref ml/base.py:7-38)."""

    def __init__(self, hdf):
        self._hdf = hdf

    def imputer(self) -> HandyImputer:
        return HandyImputer(statsDict=self._hdf.statistics_)

    def fencer(self) -> HandyFencer:
        return HandyFencer(statsDict=self._hdf.fences_)
