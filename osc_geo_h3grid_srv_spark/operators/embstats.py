"""Distributed second-moment statistics over an embedding column:
covariance matrix + PCA loadings + projection. The training-pipeline
uses: whitening before SemDeDup/IVF clustering (cosine structure is
dominated by a few high-variance directions), drift monitoring of an
embedding space across crawl snapshots, and low-rank projection before
ANN indexing. The reference engine has no vector statistics; this is
part of the beyond-reference surface (SURVEY.md "similarity search"
axis).

Spark-first design — the classic sufficient-statistics tree:

* `covariance_matrix` never shuffles data rows. One `mapInPandas` pass
  emits per-Arrow-batch partials (n_b, colsum_b, upper-triangle Gram
  G_b = X^T X) as (i, j, s, n) rows — d(d+1)/2 + d rows PER BATCH,
  independent of batch row count — and one tiny groupBy(i, j) reduces
  the partials. At 10^11 rows x dim 64 the exchange carries only
  ~2k rows per input split: the same shape as Spark MLlib's
  treeAggregate summarizer, expressed relationally so AQE handles the
  reduction fan-in. float32 inputs are widened to float64 BEFORE any
  product (exact), so partial order only perturbs the ~1e-15 tail.
* `pca` collects ONLY the d x d covariance (driver-side eigh — d is a
  model constant, never data-scale) with a deterministic sign
  convention: each eigenvector's largest-|component| entry is made
  positive, so reruns and the oracle replay agree bit-for-bit.
* `project` is pure JVM codegen: component c of row x is
  sum_j x[j] * W[j][c] unrolled as element_at * literal multiply-adds
  — no Python on the projection path, which runs at corpus scale.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PART_SCHEMA = "i int, j int, s double, n long"


def covariance_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(i, j, s, n) partial-sum rows: j >= i carries sum(x_i * x_j),
    j == -1 carries sum(x_i); n is the batch row count (constant
    within a batch's rows). Rows with NULL or wrong-length vectors are
    dropped (counted out of n)."""
    iu, ju = np.triu_indices(dim)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [v for v in pdf[vec_col]
                    if v is not None and len(v) == dim]
            if not vecs:
                continue
            x = np.asarray(vecs, dtype=np.float64)
            g = x.T @ x
            yield pd.DataFrame({
                "i": np.concatenate([iu, np.arange(dim)]),
                "j": np.concatenate([ju, np.full(dim, -1)]),
                "s": np.concatenate([g[iu, ju], x.sum(axis=0)]),
                "n": np.int64(len(x)),
            })

    return df.select(vec_col).mapInPandas(gen, _PART_SCHEMA)


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """-> (i, j, cov) for 0 <= i <= j < dim, population covariance
    cov = E[x_i x_j] - E[x_i] E[x_j] over rows with a valid vector."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    parts = covariance_partials(df, vec_col, dim)
    # n rides every partial row; summing it per (i,j) double-counts, so
    # reduce it from the j == -1 (colsum) rows of column i == 0 only
    agg = (parts.groupBy("i", "j")
           .agg(F.sum("s").alias("s"),
                F.sum(F.when((F.col("i") == 0) & (F.col("j") == -1),
                             F.col("n"))).alias("n_part")))
    n_row = (agg.agg(F.max("n_part").alias("n"))
             .select((F.coalesce("n", F.lit(0))).alias("n")))
    means = (agg.filter(F.col("j") == -1)
             .crossJoin(F.broadcast(n_row))
             .select(F.col("i"), (F.col("s") / F.col("n")).alias("m")))
    mi = means.select(F.col("i"), F.col("m").alias("m_i"))
    mj = means.select(F.col("i").alias("j"), F.col("m").alias("m_j"))
    return (agg.filter(F.col("j") >= 0)
            .crossJoin(F.broadcast(n_row))
            .join(F.broadcast(mi), "i")
            .join(F.broadcast(mj), "j")
            .select("i", "j",
                    (F.col("s") / F.col("n")
                     - F.col("m_i") * F.col("m_j")).alias("cov")))


def pca(df: DataFrame, vec_col: str, dim: int,
        n_components: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (loadings W: dim x n_components, explained variances desc).
    Only the d x d covariance is collected; sign convention: the
    largest-|component| entry of each eigenvector is positive."""
    if not 0 < n_components <= dim:
        raise ValueError(
            f"n_components {n_components} not in 1..{dim}")
    rows = covariance_matrix(df, vec_col, dim).collect()
    c = np.zeros((dim, dim))
    for r in rows:
        c[r["i"], r["j"]] = c[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)          # ascending
    order = np.argsort(vals)[::-1][:n_components]
    w = vecs[:, order]
    for k in range(w.shape[1]):
        lead = np.argmax(np.abs(w[:, k]))
        if w[lead, k] < 0:
            w[:, k] = -w[:, k]
    return w, vals[order]


def project(df: DataFrame, vec_col: str, loadings: Sequence[Sequence[float]],
            out_prefix: str = "pc") -> DataFrame:
    """append pc0..pc{k-1} = x @ W as pure-JVM multiply-adds (no
    Python: this path runs at corpus scale, unlike the d x d fit)."""
    w = np.asarray(loadings, dtype=np.float64)
    cols = [
        sum((F.element_at(F.col(vec_col), int(j) + 1).cast("double")
             * float(w[j, k]) for j in range(w.shape[0])),
            start=F.lit(0.0)).alias(f"{out_prefix}{k}")
        for k in range(w.shape[1])
    ]
    return df.select("*", *cols)
