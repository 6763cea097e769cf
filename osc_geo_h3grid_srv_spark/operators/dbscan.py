"""Grid DBSCAN: density-based spatial clustering at cell granularity —
the standard grid formulation (Gunawan 2013; the exact-DBSCAN grid
decomposition in Gan & Tao, SIGMOD 2015 — public literature) where the
plane is pre-quantized into eps-sized cells, density is tested on the
queen 8-neighborhood, and clusters are connected components of dense
cells. The engine's A4 queries already emit per-cell aggregates; this
operator turns them into cluster labels (the "where are the settled
areas / sensor clusters / correlated-asset groups" question the
reference's hotspot users ask next). Equivalent point-DBSCAN knobs:
eps = one cell pitch under the Chebyshev metric, minPts = min_pts.

Semantics (deterministic, no scan order):
* n_pts(c)   = points in cell c;
* nbhd(c)    = sum of n_pts over the 9 cells within Chebyshev
  distance 1 (self included);
* CORE cell  : nbhd(c) >= min_pts;
* clusters   = connected components of core cells under queen
  adjacency; label = smallest encoded cell key in the component;
* BORDER cell: non-core, has >= 1 core cell among its 8 neighbors;
  labeled with the MIN adjacent core label (the deterministic stand-in
  for point-DBSCAN's arbitrary first-claim tie-break);
* NOISE      : everything else (cluster NULL).

Scale design: every step runs on the CELL relation (orders of
magnitude smaller than the points — the points are touched exactly
once by the initial groupBy). Neighborhood expansion is a 9-row
literal explode + equi-join on cell keys, never a theta join; the
component loop is the alternating large-star/small-star machinery from
operators/cluster.py (per-round localCheckpoint, no driver graph).
The DuckDB oracle replays the whole pipeline with a recursive-CTE
min-label closure, so the iterative Spark loop is value-hash-gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.cluster import (
    connected_components)

# cell keys are (gx, gy) packed into one long so the component loop
# runs on scalar ids: key = (gx + 2^20) * 2^21 + (gy + 2^20)
_OFF = 1 << 20
_SPAN = 1 << 21


def cell_key(gx: Column, gy: Column) -> Column:
    return ((gx + F.lit(_OFF)) * F.lit(_SPAN)
            + (gy + F.lit(_OFF))).cast("long")


def cell_key_sql(gx: str, gy: str) -> str:
    """the identical packing for the DuckDB oracle replay."""
    return f"(({gx} + {_OFF}) * {_SPAN} + ({gy} + {_OFF}))::bigint"


def _nbr9() -> Column:
    # built lazily: Column literals need an active SparkContext, which
    # does not exist at import time
    return F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])


def dbscan_grid(points: DataFrame, gx: str = "gx", gy: str = "gy",
                min_pts: int = 4, validate: bool = True) -> DataFrame:
    """-> (gx, gy, n_pts, is_core, cluster) for every non-empty cell;
    cluster is the smallest member core-cell key (NULL for noise).
    `validate` runs one tiny agg over the CELL relation and raises if
    any coordinate falls outside the +-2^20 packing range."""
    if min_pts <= 0:
        raise ValueError(f"min_pts must be positive, got {min_pts}")
    cells = (points.groupBy(F.col(gx).cast("long").alias("gx"),
                            F.col(gy).cast("long").alias("gy"))
             .agg(F.count("*").cast("bigint").alias("n_pts"))
             .localCheckpoint(eager=True))
    if validate:
        b = cells.agg(F.min("gx"), F.max("gx"),
                      F.min("gy"), F.max("gy")).collect()[0]
        if b[0] is not None and (min(b[0], b[2]) <= -_OFF
                                 or max(b[1], b[3]) >= _OFF):
            raise ValueError(
                f"grid coords {tuple(b)} exceed the +-{_OFF} packing "
                "range; rescale the quantization")

    probes = (cells.select("gx", "gy", F.explode(_nbr9()).alias("o"))
              .select("gx", "gy",
                      (F.col("gx") + F.col("o.dx")).alias("nx"),
                      (F.col("gy") + F.col("o.dy")).alias("ny")))
    vals = cells.select(F.col("gx").alias("nx"),
                        F.col("gy").alias("ny"), "n_pts")
    dens = (probes.join(vals, ["nx", "ny"])
            .groupBy("gx", "gy")
            .agg(F.sum("n_pts").alias("nbhd")))
    flagged = (cells.join(dens, ["gx", "gy"])
               .withColumn("is_core", F.col("nbhd") >= F.lit(min_pts))
               .withColumn("key", cell_key(F.col("gx"), F.col("gy")))
               .localCheckpoint(eager=True))

    core = flagged.filter("is_core").select("gx", "gy", "key")
    # core-core queen adjacency (self-pairs excluded by the CC filter)
    cprobe = (core.select("key", F.explode(_nbr9()).alias("o"),
                          "gx", "gy")
              .select("key",
                      cell_key(F.col("gx") + F.col("o.dx"),
                               F.col("gy") + F.col("o.dy"))
                      .alias("nkey")))
    edges = cprobe.join(core.select(F.col("key").alias("nkey")), "nkey")
    comp = connected_components(edges, src="key", dst="nkey")
    core_lab = (core.join(comp, core["key"] == comp["node"], "left")
                .select("gx", "gy", "key",
                        F.coalesce("component", "key").alias("cluster")))

    # border: non-core cell adjacent to >= 1 core; min adjacent label
    nclab = core_lab.select(
        F.col("gx").alias("nx"), F.col("gy").alias("ny"),
        F.col("cluster").alias("ncl"))
    border = (flagged.filter(~F.col("is_core"))
              .select("gx", "gy", F.explode(_nbr9()).alias("o"))
              .filter((F.col("o.dx") != 0) | (F.col("o.dy") != 0))
              .select("gx", "gy",
                      (F.col("gx") + F.col("o.dx")).alias("nx"),
                      (F.col("gy") + F.col("o.dy")).alias("ny"))
              .join(nclab, ["nx", "ny"])
              .groupBy("gx", "gy")
              .agg(F.min("ncl").alias("cluster")))

    lab = (core_lab.select("gx", "gy", "cluster")
           .unionByName(border.select("gx", "gy", "cluster")))
    return (flagged.select("gx", "gy", "n_pts", "is_core")
            .join(lab, ["gx", "gy"], "left")
            .select("gx", "gy", "n_pts", "is_core", "cluster"))
