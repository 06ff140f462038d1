"""Distributed linear decomposition over embedding columns (§7).

PCA at corpus scale is two different problems glued together: a
DISTRIBUTED moment computation (the only part that touches the 100 TB
corpus) and a TINY dense eigenproblem (dim × dim — kilobytes). The
split here mirrors Spark MLlib's RowMatrix.computePrincipalComponents:

- pass 1: each partition folds its vectors into (count, Σx, ΣxᵀX) via
  one Arrow-batched mapInPandas — the classic tree-aggregate of
  sufficient statistics; the driver receives one moment row PER
  PARTITION (never per vector) and sums them.
- driver: covariance = G/n − x̄x̄ᵀ (population), `numpy.linalg.eigh`
  on the dim × dim symmetric matrix, top-k eigenvectors.
- pass 2: projection is a broadcast of the k × dim component matrix and
  a narrow per-row expression (centered dot products) — no shuffle.

Component sign is fixed deterministically (the largest-|coefficient|
entry of each eigenvector is made positive, lowest index on ties), so
repeated runs and test reruns produce identical projections.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citibike_analysis_spark.operators.similarity import as_double, dot


def _moment_fold(dim: int):
    """mapInPandas fold: vector batches → ONE (n, Σx, ΣxᵀX) row per partition."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for batch in batches:
            # NULL vectors are skipped (the repo-wide NULL-propagation
            # convention: NULL rows never contribute); ragged widths get
            # the documented contract error instead of numpy's opaque
            # inhomogeneous-shape failure (review finding — the same
            # hardening similarity._keys received in r04)
            rows = [v for v in batch["_v"].tolist() if v is not None]
            if not rows:
                continue
            bad = next((len(v) for v in rows if len(v) != dim), None)
            if bad is not None:
                raise ValueError(
                    f"embedding width mismatch: expected {dim}, got {bad}"
                )
            x = np.array(rows, dtype=np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return fold


def pca_components(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """(mean [dim], components [k × dim]) of the corpus — driver-side
    arrays, kilobytes, computed from one distributed moment pass."""
    c = corpus.select(as_double(F.col(vec_col)).alias("_v"))
    first = c.filter(F.col("_v").isNotNull()).first()
    if first is None:
        raise ValueError(
            "pca_components: corpus has no non-NULL vectors — nothing to fit"
        )
    dim = len(first["_v"])
    parts = c.mapInPandas(
        _moment_fold(dim), "n long, s array<double>, g array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    g = np.sum([np.array(r["g"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :n_components].T  # k × dim, by descending eigenvalue
    for i in range(comps.shape[0]):  # deterministic sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 4,
) -> DataFrame:
    """Project every vector onto the corpus's top principal components:
    (vec_id, pcs array<double>[k], rounded to 6) — the
    dimensionality-reduction step before cheap clustering/visualization
    of an embedding corpus.

    The projection pass is a narrow per-row expression against a 1-row
    broadcast of (mean, components) — same plan pattern as the LSH plane
    frame (a nested literal would be an analysis-cost trap; see
    similarity._planes_frame).
    """
    mean, comps = pca_components(corpus, vec_col, n_components)
    spark = corpus.sparkSession
    basis = spark.createDataFrame(
        [(mean.tolist(), comps.tolist())],
        "__mean: array<double>, __comps: array<array<double>>",
    )
    centered = F.zip_with(
        as_double(F.col(vec_col)), F.col("__mean"), lambda x, m: x - m
    )
    return (
        corpus.crossJoin(F.broadcast(basis))
        .select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col("__comps").alias("__comps"),
            centered.alias("__c"),
        )
        .select(
            "vec_id",
            F.transform(
                F.col("__comps"), lambda p: F.round(dot(F.col("__c"), p), 6)
            ).alias("pcs"),
        )
    )
