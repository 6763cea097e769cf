"""Distributed H3 compact / uncompact over cell-set DataFrames.

Polyfills and per-cell rollups at fine resolutions produce huge cell
sets whose interiors are perfectly regular; the public H3 compact
operation losslessly replaces every complete sibling group (7
children, 6 for a pentagon parent) by its parent, cascading toward
res 0 — routinely a 5-7x row reduction on region interiors, which at
10^12-cell scale is the difference between shipping a cell list and
shipping a summary.

Plan shape (the thing that must hold at scale): one level = one
groupBy(parent) count + one co-partitioned anti-join — both keyed by
the parent int64, both with map-side partial aggregation; at most 15
levels, each behind a localCheckpoint so lineage stays flat. The
parent derivation is pure JVM bit math (no Python): stepping one
level only rewrites the resolution nibble and one 3-bit digit slot.
Pentagon parents (12 per resolution, a fixed literal set) expect 6
children instead of 7. The only driver round-trip is one min/max
resolution scalar.

Everything here mirrors functions/h3core.py compact_cells /
uncompact_cells (the NumPy kernel, property-tested against it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.h3core import pentagon_cells

_RES_MASK = 0xF << 52


def _res_expr(cell):
    return F.shiftright(cell, 52).bitwiseAND(F.lit(0xF))


def _parent_expr(cell, r: int):
    """parent at res r-1 of a res-r cell: rewrite the res nibble, set
    digit r to 7 (coarser digits are untouched, finer already 7)."""
    return (cell.bitwiseAND(F.lit(~_RES_MASK))
            .bitwiseOR(F.lit((r - 1) << 52))
            .bitwiseOR(F.lit(7 << ((15 - r) * 3))))


def compact_cells_df(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """distinct H3 cells (long) -> the compacted equivalent set.
    Input must be non-overlapping (no cell an ancestor of another),
    the same contract as the public H3 API."""
    cur = df.select(F.col(cell_col).alias("cell")).distinct() \
        .localCheckpoint(eager=True)
    bounds = cur.agg(F.max(_res_expr(F.col("cell"))).alias("hi")) \
        .collect()[0]
    if bounds["hi"] is None:
        return cur
    for r in range(int(bounds["hi"]), 0, -1):
        res = _res_expr(F.col("cell"))
        at_r = cur.filter(res == r)
        rest = cur.filter(res != r)
        pent = [int(x) for x in pentagon_cells(r - 1)]
        need = F.when(F.col("parent").isin(pent), 6).otherwise(7)
        par = at_r.select(_parent_expr(F.col("cell"), r).alias("parent"),
                          "cell")
        full = (par.groupBy("parent").agg(F.count("*").alias("n"))
                .filter(F.col("n") == need).select("parent"))
        keep = (par.join(full, "parent", "left_anti").select("cell"))
        promoted = full.select(F.col("parent").alias("cell"))
        cur = (rest.unionByName(keep).unionByName(promoted)
               .localCheckpoint(eager=True))
    return cur


def uncompact_cells_df(df: DataFrame, res: int,
                       cell_col: str = "cell") -> DataFrame:
    """expand every cell to its descendants at `res` — one explode per
    level, child derivation in JVM bit math, pentagon cells (fixed
    literal set per level) skip the deleted digit 1."""
    cur = df.select(F.col(cell_col).alias("cell")).distinct()
    # same contract as the NumPy kernel: cells finer than the target
    # are an error, not a silent passthrough into a mixed-res output
    n_finer = cur.filter(_res_expr(F.col("cell")) > res).limit(1).count()
    if n_finer:
        raise ValueError(
            f"uncompact_cells_df: input contains cells finer than "
            f"res {res}")
    for r in range(0, res):
        c = F.col("cell")
        is_coarser = _res_expr(c) == r
        pent = [int(x) for x in pentagon_cells(r)]
        digits = F.when(c.isin(pent),
                        F.array(*[F.lit(d) for d in (0, 2, 3, 4, 5, 6)])
                        ).otherwise(
            F.array(*[F.lit(d) for d in range(7)]))
        shift = (15 - (r + 1)) * 3
        kids = (cur.filter(is_coarser)
                .select(c.alias("p"), F.explode(digits).alias("d"))
                .select((F.col("p").bitwiseAND(F.lit(~_RES_MASK))
                         .bitwiseOR(F.lit((r + 1) << 52))
                         .bitwiseAND(F.lit(~(7 << shift)))
                         .bitwiseOR(F.shiftleft(
                             F.col("d").cast("long"), shift)))
                        .alias("cell")))
        cur = (cur.filter(~is_coarser).unionByName(kids)
               .localCheckpoint(eager=True))
    return cur
