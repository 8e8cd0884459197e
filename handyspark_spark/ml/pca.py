"""Covariance matrices and PCA projection / whitening, DataFrame-native.

The reference's ML surface stops at vector disassembly and imputer-style
transformers; PCA is the standard next ask for a training-data pipeline
(decorrelate features, compress embedding columns). The split of labor is
the only one that scales:

- the k×k covariance matrix is computed CLUSTER-side in one wide
  aggregation (``F.covar_samp`` over all pairs — same fused-agg shape as
  ``corr_plan``);
- the eigendecomposition runs DRIVER-side on that k×k matrix (numpy
  ``eigh``; k is the column count, never the row count);
- the projection is compiled back into a native map-only expression —
  no UDF, no shuffle, no per-row Python.

At 100 TB the data is touched exactly twice: once for the covariance
pass, once when projecting (lazily, fused into whatever plan consumes
the components).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_plan", "pca_fit", "pca_project"]


def covariance_plan(df: DataFrame, colnames: list[str]) -> DataFrame:
    """Pairwise sample covariance, long form (col_x, col_y, cov) for the
    upper triangle — ONE wide aggregation over all pairs."""
    exprs = []
    for i, cx in enumerate(colnames):
        for cy in colnames[i:]:
            exprs.append(F.covar_samp(F.col(cx).cast("double"),
                                      F.col(cy).cast("double"))
                         .alias(f"{cx}__{cy}"))
    wide = df.agg(*exprs)
    pairs = [(cx, cy) for i, cx in enumerate(colnames) for cy in colnames[i:]]
    stack = F.expr("stack({}, {})".format(
        len(pairs),
        ", ".join(f"'{cx}', '{cy}', `{cx}__{cy}`" for cx, cy in pairs)))
    return wide.select(stack.alias("col_x", "col_y", "cov"))


def pca_fit(df: DataFrame, colnames: list[str]) -> dict:
    """Fit PCA on the named numeric columns. One cluster-side job (means
    + covariance in the same wide agg), then a k×k ``numpy.linalg.eigh``
    on the driver.

    Sign convention: each eigenvector is flipped so its largest-magnitude
    component is positive — deterministic across BLAS implementations.
    Returns {"mean": (k,), "components": (k, k) rows = components in
    descending eigenvalue order, "explained_variance": (k,)}.
    """
    k = len(colnames)
    exprs = [F.avg(F.col(c).cast("double")).alias(f"_mu_{c}")
             for c in colnames]
    for i, cx in enumerate(colnames):
        for cy in colnames[i:]:
            exprs.append(F.covar_samp(F.col(cx).cast("double"),
                                      F.col(cy).cast("double"))
                         .alias(f"_cv_{i}_{colnames.index(cy)}"))
    row = df.agg(*exprs).first()
    mean = np.array([row[f"_mu_{c}"] for c in colnames])
    cov = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            cov[i, j] = cov[j, i] = row[f"_cv_{i}_{j}"]
    vals, vecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order].T  # rows = components
    for r in range(k):
        m = np.argmax(np.abs(vecs[r]))
        if vecs[r, m] < 0:
            vecs[r] = -vecs[r]
    return {"mean": mean, "components": vecs, "explained_variance": vals}


def pca_project(df: DataFrame, colnames: list[str], model: dict,
                n_components: int | None = None,
                whiten: bool = False, prefix: str = "pc") -> DataFrame:
    """Append principal-component scores as native expression columns:
    ``pc{i} = Σ_j components[i][j] · (col_j − mean_j)`` (divided by
    √eigenvalue when ``whiten``). Map-only — the fitted constants fold
    into the projection, exactly like ``fill``/``fence`` compile their
    fitted statistics."""
    comps = model["components"]
    mean = model["mean"]
    ev = model["explained_variance"]
    n = n_components or comps.shape[0]
    centered = [F.col(c).cast("double") - F.lit(float(mean[j]))
                for j, c in enumerate(colnames)]
    out = df
    for i in range(n):
        expr = None
        for j in range(len(colnames)):
            term = centered[j] * F.lit(float(comps[i, j]))
            expr = term if expr is None else expr + term
        if whiten:
            expr = expr / F.lit(float(np.sqrt(max(ev[i], 1e-300))))
        out = out.withColumn(f"{prefix}{i}", expr)
    return out
