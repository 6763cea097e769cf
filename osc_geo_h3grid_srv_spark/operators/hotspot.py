"""Hotspot detection: Getis-Ord Gi* local spatial statistic (Getis &
Ord, Geographical Analysis 1992; Ord & Getis 1995 — public literature)
over gridded aggregates. Gi* answers "is the value around cell i
significantly above/below the corpus mean?" — the standard local
clustering test in spatial analytics, here over the same per-cell
aggregate relations the engine's A4 queries emit.

With binary weights w_ij = 1 for j in the neighborhood of i (self
included — the * variant), W_i = |neighborhood present in the data|:

    z_i = (sum_j x_j  -  xbar * W_i)
          / ( S * sqrt( (n*W_i - W_i^2) / (n - 1) ) )

    xbar = sum x / n,   S = sqrt( sum x^2 / n - xbar^2 )

Two neighborhood backends:

* `gi_star_grid` — queen 8-neighborhood on an integer (gx, gy) grid.
  Fully relational: the neighborhood expansion is a 9-row literal
  explode + equi-join, so a SQL oracle replays the whole statistic
  (the `gi_star_hotspots` entry is value-hash-gated against DuckDB).
* `gi_star_h3` — k-ring neighborhood on H3 cells via the NumPy kernel
  (functions/h3core.k_ring), the true geodesic variant; kernel ops are
  not SQL-expressible, so its entry is rows-gated and pytest carries
  the brute-force parity.

Scale design: the input is already a PER-CELL aggregate (orders of
magnitude smaller than the point data); the neighbor join is an
equi-join on cell keys (9x or ~(3k^2)x fan-out of the CELL relation,
never the points); global stats ride a broadcast 1-row aggregate.
No reference counterpart (the reference aggregates but never tests
significance); formulas from the public Getis-Ord papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gi_star(nbr_sums: DataFrame, stats: DataFrame,
             out_cols: list[str]) -> DataFrame:
    """shared z-score assembly: nbr_sums has (out_cols..., w_i, sx)."""
    j = nbr_sums.crossJoin(F.broadcast(stats))
    w = F.col("w_i").cast("double")
    num = F.col("sx") - F.col("xbar") * w
    den = F.col("s") * F.sqrt(
        (F.col("n") * w - w * w) / (F.col("n") - F.lit(1.0)))
    return j.select(
        *out_cols, F.col("w_i").cast("long").alias("w_i"),
        F.round(F.when(den != 0, num / den), 5).alias("gi_z"))


def gi_star_grid(cells: DataFrame, x_col: str = "x",
                 gx: str = "gx", gy: str = "gy") -> DataFrame:
    """-> (gx, gy, w_i, gi_z round 5) per input cell, queen
    8-neighborhood + self on the integer grid."""
    base = cells.select(F.col(gx).alias("gx"), F.col(gy).alias("gy"),
                        F.col(x_col).cast("double").alias("x"))
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.sqrt(F.avg(F.col("x") * F.col("x"))
               - F.avg("x") * F.avg("x")).alias("s"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    probes = (base.select("gx", "gy", F.explode(offs).alias("o"))
              .select("gx", "gy",
                      (F.col("gx") + F.col("o.dx")).alias("nx"),
                      (F.col("gy") + F.col("o.dy")).alias("ny")))
    vals = base.select(F.col("gx").alias("nx"), F.col("gy").alias("ny"),
                       "x")
    nbr = (probes.join(vals, ["nx", "ny"])
           .groupBy("gx", "gy")
           .agg(F.count("*").alias("w_i"), F.sum("x").alias("sx")))
    return _gi_star(nbr, stats, ["gx", "gy"])


def gi_star_h3(cells: DataFrame, cell_col: str = "cell",
               x_col: str = "x", k: int = 1) -> DataFrame:
    """-> (cell, w_i, gi_z round 5) per input H3 cell (uint64 ids),
    k-ring neighborhood (self included) from the NumPy H3 kernel,
    applied per Arrow batch — the cell relation is the small side, so
    the kernel call never touches point-level data."""
    import pyarrow as pa

    if k < 1:
        raise ValueError(f"k {k} must be >= 1")
    base = cells.select(F.col(cell_col).alias("cell"),
                        F.col(x_col).cast("double").alias("x"))
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.sqrt(F.avg(F.col("x") * F.col("x"))
               - F.avg("x") * F.avg("x")).alias("s"))

    def expand(batches):
        import numpy as np
        from osc_geo_h3grid_srv_spark.functions import h3core
        for b in batches:
            h = b.column("cell").to_numpy(zero_copy_only=False)
            h = np.asarray(h, dtype=np.uint64)
            if h.size == 0:
                continue
            ring = h3core.k_ring(h, k)           # (m, n_ring) incl. self
            m, r = ring.shape
            yield pa.record_batch({
                "cell": pa.array(np.repeat(h, r).astype(np.int64),
                                 type=pa.int64()),
                "nbr": pa.array(ring.ravel().astype(np.int64),
                                type=pa.int64()),
            })

    # k_ring may emit duplicate cells near pentagons (the disk is
    # smaller there) — dedupe the EDGE relation so w_i counts each
    # neighbor once; cell-relation-sized, narrow (16 bytes/row)
    edges = (base.select("cell").mapInArrow(expand, "cell long, nbr long")
             .dropDuplicates(["cell", "nbr"]))
    vals = base.select(F.col("cell").alias("nbr"), "x")
    nbr = (edges.join(vals, "nbr")
           .groupBy("cell")
           .agg(F.count("*").alias("w_i"), F.sum("x").alias("sx")))
    return _gi_star(nbr, stats, ["cell"])


def morans_i_grid(cells: DataFrame, x_col: str = "x",
                  gx: str = "gx", gy: str = "gy") -> DataFrame:
    """Global Moran's I spatial autocorrelation (Moran 1950; Cliff &
    Ord 1981 normality inference — public literature) with binary queen
    8-neighborhood weights (self EXCLUDED), over the same per-cell
    aggregate relation gi_star_grid consumes:

        I  = (n / W) * sum_ij w_ij (x_i - xbar)(x_j - xbar)
                     / sum_i (x_i - xbar)^2
        E[I] = -1 / (n - 1)
        Var[I] (normality) = (n^2 S1 - n S2 + 3 W^2)
                             / (W^2 (n^2 - 1))  -  E[I]^2
        z = (I - E[I]) / sqrt(Var[I])

    where, for symmetric binary weights, S1 = 2 W and
    S2 = sum_i (in_degree_i + out_degree_i)^2 = 4 * sum_i deg_i^2.

    -> one row (n, w_pairs, morans_i, e_i, z) rounded to 5. Fully
    relational (the neighborhood is the same 8-offset explode +
    equi-join), so the entire statistic including the variance is
    value-hash-gated against a DuckDB replay.
    """
    base = cells.select(F.col(gx).alias("gx"), F.col(gy).alias("gy"),
                        F.col(x_col).cast("double").alias("x"))
    stats = base.agg(F.count("*").cast("double").alias("n"),
                     F.avg("x").alias("xbar"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)])
    probes = (base.select("gx", "gy", "x", F.explode(offs).alias("o"))
              .select("gx", "gy", F.col("x").alias("xi"),
                      (F.col("gx") + F.col("o.dx")).alias("nx"),
                      (F.col("gy") + F.col("o.dy")).alias("ny")))
    vals = base.select(F.col("gx").alias("nx"), F.col("gy").alias("ny"),
                       F.col("x").alias("xj"))
    edges = probes.join(vals, ["nx", "ny"])
    cross = (edges.crossJoin(F.broadcast(stats))
             .agg(F.sum((F.col("xi") - F.col("xbar"))
                        * (F.col("xj") - F.col("xbar"))).alias("sc"),
                  F.count("*").cast("double").alias("w")))
    degs = (edges.groupBy("gx", "gy")
            .agg(F.count("*").cast("double").alias("deg")))
    s2 = degs.agg(
        (4.0 * F.sum(F.col("deg") * F.col("deg"))).alias("s2"))
    ssq = (base.crossJoin(F.broadcast(stats))
           .agg(F.sum((F.col("x") - F.col("xbar"))
                      * (F.col("x") - F.col("xbar"))).alias("ss")))
    j = (cross.crossJoin(F.broadcast(ssq))
         .crossJoin(F.broadcast(s2))
         .crossJoin(F.broadcast(stats)))
    n = F.col("n")
    w = F.col("w")
    mi = (n / w) * F.col("sc") / F.col("ss")
    ei = F.lit(-1.0) / (n - 1.0)
    s1 = 2.0 * w
    var = ((n * n * s1 - n * F.col("s2") + 3.0 * w * w)
           / (w * w * (n * n - 1.0))) - ei * ei
    return j.select(
        n.cast("long").alias("n"), w.cast("long").alias("w_pairs"),
        F.round(mi, 5).alias("morans_i"),
        F.round(ei, 5).alias("e_i"),
        F.round(F.when(var > 0, (mi - ei) / F.sqrt(var)), 5).alias("z"))


def local_moran_grid(cells: DataFrame, x_col: str = "x",
                     gx: str = "gx", gy: str = "gy") -> DataFrame:
    """LISA — Local Indicators of Spatial Association (Anselin,
    Geographical Analysis 1995), the per-cell decomposition of
    Moran's I with the same queen weights (self excluded):

        z_i = x_i - xbar,     m2 = sum z^2 / n
        I_i = (z_i / m2) * sum_j w_ij z_j
        E[I_i] = -W_i / (n - 1)          (binary weights, normality)

    plus the Moran-scatter quadrant label: HH (hot cluster core),
    LL (cold), HL / LH (spatial outliers) from the signs of z_i and
    the neighborhood lag. -> (gx, gy, w_i, local_i round 5, e_i
    round 5, quadrant). Cells with no present neighbor are dropped
    (their lag is undefined). sum_i I_i / W = global I, which the
    pytest cross-checks against morans_i_grid.
    """
    base = cells.select(F.col(gx).alias("gx"), F.col(gy).alias("gy"),
                        F.col(x_col).cast("double").alias("x"))
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        (F.sum(F.col("x") * F.col("x")) / F.count("*")
         - F.avg("x") * F.avg("x")).alias("m2"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)])
    probes = (base.select("gx", "gy", F.col("x").alias("xi"),
                          F.explode(offs).alias("o"))
              .select("gx", "gy", "xi",
                      (F.col("gx") + F.col("o.dx")).alias("nx"),
                      (F.col("gy") + F.col("o.dy")).alias("ny")))
    vals = base.select(F.col("gx").alias("nx"), F.col("gy").alias("ny"),
                       F.col("x").alias("xj"))
    nbr = (probes.join(vals, ["nx", "ny"])
           .groupBy("gx", "gy", "xi")
           .agg(F.count("*").alias("w_i"), F.sum("xj").alias("sxj")))
    j = nbr.crossJoin(F.broadcast(stats))
    zi = F.col("xi") - F.col("xbar")
    lag = F.col("sxj") - F.col("w_i").cast("double") * F.col("xbar")
    li = zi / F.col("m2") * lag
    quad = (F.when((zi >= 0) & (lag >= 0), F.lit("HH"))
            .when((zi < 0) & (lag < 0), F.lit("LL"))
            .when((zi >= 0) & (lag < 0), F.lit("HL"))
            .otherwise(F.lit("LH")))
    return j.select(
        "gx", "gy", F.col("w_i").cast("long").alias("w_i"),
        F.round(li, 5).alias("local_i"),
        F.round(-F.col("w_i").cast("double") / (F.col("n") - 1.0), 5)
        .alias("e_i"),
        quad.alias("quadrant"))
