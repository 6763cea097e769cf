"""Blocked fuzzy pair join: all same-block string pairs within a
bounded Levenshtein edit distance — the character-level member of the
dedup family (exact hash < edit distance < n-gram Jaccard < MinHash),
the tool for near-identical URLs/titles/product names where token
methods are too coarse.

Contract: EXACT within blocks. The block column is the recall knob
the caller owns (URL host, title prefix, sorted-signature bucket —
standard blocking literature); within a block every qualifying pair
surfaces exactly once. The length prefilter |len(a) − len(b)| ≤ d is
a pure optimization — edit distance can never be below the length
gap — so it cannot drop a true pair (the entry oracle omits it,
proving the prune sound against the unpruned in-block quadratic).

Scale shape: one equi-join on the block key (AQE skew-split if one
block is hot), the cheap length prune before the O(d·min(len))
banded levenshtein (Spark's 3-arg form stops at the threshold), and
per-block candidate counts bounded by block sizing — never
|corpus|². All JVM codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(df: DataFrame, max_dist: int,
                id_col: str = "id", str_col: str = "s",
                block_col: str = "block") -> DataFrame:
    """-> (id_a, id_b, dist), id_a < id_b, levenshtein <= max_dist,
    candidates restricted to equal block_col values."""
    if max_dist < 0:
        raise ValueError(f"max_dist {max_dist} must be >= 0")
    a = df.select(F.col(block_col).alias("__b"),
                  F.col(id_col).alias("id_a"),
                  F.col(str_col).alias("__sa"))
    b = df.select(F.col(block_col).alias("__b"),
                  F.col(id_col).alias("id_b"),
                  F.col(str_col).alias("__sb"))
    d = int(max_dist)
    lev = F.levenshtein(F.col("__sa"), F.col("__sb"), d)
    return (a.join(b, "__b")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.abs(F.length("__sa") - F.length("__sb"))
                    <= F.lit(d))
            .withColumn("dist", lev)
            .filter(F.col("dist") >= 0)  # 3-arg levenshtein: -1 = over
            .select("id_a", "id_b", F.col("dist").cast("int")
                    .alias("dist")))
