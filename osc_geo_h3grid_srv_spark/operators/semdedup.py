"""SemDeDup: semantic deduplication via embedding-cluster pruning.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv 2303.09540, public literature): cluster
the corpus embeddings with k-means, compute pairwise cosine similarity
ONLY within each cluster, and prune every example that has a
semantic duplicate (cosine >= eps) while keeping, per duplicate
relation, the example with the LOWEST cosine similarity to its cluster
centroid (the most "extreme" / least redundant point survives).

Spark-first shape:

* assignment + centroid similarity: ONE map-side codegen projection —
  the centroid dot-product array is a literal expression
  (`similarity._dot_expr`), the cluster is its argmax, and the
  centroid cosine is `array_max(dots)/|v|` (centroids are unit-norm),
  so assignment adds zero work beyond the dots already computed.
* candidate pairs: an equi self-join keyed by the cluster id — never a
  crossJoin. Candidate work is sum over clusters of |c|^2, which is
  the SemDeDup contract: n_lists is the knob (the paper uses ~sqrt(N)
  clusters so E[|c|] stays bounded as the corpus grows). Hot clusters
  split under AQE skew-join, and at warehouse scale the cluster id is
  a partition column so pair generation is partition-local.
* prune decision: a pair loser is the side with the GREATER
  (centroid_cos, id) key — deterministic, replayable, and exactly the
  paper's keep-low-centroid-similarity rule with an id tie-break. The
  kept set is a LeftAnti join of the corpus against the distinct
  losers (narrow: ids only cross the wire).

No Python touches the data path; every float the decision reads is
rounded (pair cosine to 6, centroid cosine to `round_digits`) so the
DuckDB oracle replay and any re-run reproduce the identical kept set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot_expr


def assign_with_centroid_cos(emb: DataFrame, centroids,
                             vec_col: str = "embedding",
                             round_digits: int = 9) -> DataFrame:
    """adds `cluster` (argmax centroid dot, first-match tie-break) and
    `centroid_cos` (cosine to the assigned centroid, valid because the
    centroids are unit-norm) in one shuffle-free projection."""
    v_dbl = F.col(vec_col).cast("array<double>")
    d = emb.withColumn("__v", v_dbl)
    ds = F.array(*[_dot_expr("__v", c) for c in centroids])
    nv = F.sqrt(F.expr("aggregate(__v, cast(0.0 as double), "
                       "(acc, v) -> acc + v * v)"))
    return (d.withColumn("__ds", ds)
            .withColumn("cluster",
                        (F.array_position(F.col("__ds"),
                                          F.array_max("__ds")) - 1)
                        .cast("int"))
            .withColumn("centroid_cos",
                        F.round(F.array_max("__ds") / nv,
                                round_digits))
            .drop("__ds"))


def semdedup_prune(emb: DataFrame, centroids, eps: float,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_digits: int = 9) -> DataFrame:
    """(id, cluster, centroid_cos, kept) for every input row.

    kept=false iff the row has some same-cluster neighbor with pair
    cosine >= eps whose (centroid_cos, id) key is strictly smaller —
    i.e. for every semantic-duplicate relation the example farthest
    from its centroid survives (SemDeDup keep rule), ties to the
    lower id. The rule is pairwise (matrix form of the paper), so the
    kept set is order-free and idempotent to recompute.

    Centroids come from `similarity.ivf_seed_centroids` (+ optional
    `ivf_refine`) — deterministic literals, so the full decision chain
    is engine-portable and oracle-replayable."""
    base = assign_with_centroid_cos(emb, centroids, vec_col,
                                    round_digits)
    nv = F.sqrt(F.expr("aggregate(__v, cast(0.0 as double), "
                       "(acc, v) -> acc + v * v)"))
    side = base.select(F.col(id_col).alias("__id"),
                       F.col("cluster").alias("__cl"),
                       F.col("centroid_cos").alias("__cc"),
                       F.col("__v"), nv.alias("__n"))
    a = side.select(F.col("__id").alias("id_a"),
                    F.col("__cl").alias("__cl"),
                    F.col("__cc").alias("cc_a"),
                    F.col("__v").alias("v_a"), F.col("__n").alias("n_a"))
    b = side.select(F.col("__id").alias("id_b"),
                    F.col("__cl").alias("__cl"),
                    F.col("__cc").alias("cc_b"),
                    F.col("__v").alias("v_b"), F.col("__n").alias("n_b"))
    dot = F.expr("aggregate(zip_with(v_a, v_b, (x, y) -> x * y), "
                 "cast(0.0 as double), (acc, v) -> acc + v)")
    pairs = (a.join(b, "__cl")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("__cos", F.round(dot / (F.col("n_a")
                                                 * F.col("n_b")), 6))
             .filter(F.col("__cos") >= F.lit(float(eps))))
    key_gt = ((F.col("cc_a") > F.col("cc_b"))
              | ((F.col("cc_a") == F.col("cc_b"))
                 & (F.col("id_a") > F.col("id_b"))))
    losers = (pairs.select(F.when(key_gt, F.col("id_a"))
                           .otherwise(F.col("id_b")).alias("__loser"))
              .distinct())
    out = base.select(id_col, "cluster", "centroid_cos")
    return (out.join(losers,
                     out[id_col] == losers["__loser"], "left")
            .select(id_col, "cluster", "centroid_cos",
                    F.col("__loser").isNull().alias("kept")))
