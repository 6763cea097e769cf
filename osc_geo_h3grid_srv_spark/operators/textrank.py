"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004 — public
paper): weighted PageRank over the word co-occurrence graph. Nodes are
corpus terms, edges are adjacent-word co-occurrences (undirected,
weight = count, built from the same bigram relation the collocation
operator uses), and the score recursion is the paper's weighted form

    s(v) = (1 - d) + d * sum over neighbors u of
               w_uv / W_u * s(u),        W_u = sum_x w_ux

(the (1-d) constant, NOT (1-d)/N — TextRank keeps unnormalized scores;
d = 0.85, init 1.0).

Correctness discipline is the same as operators/linkgraph.pagerank:
every iteration ROUNDS to `round_digits`, so a SQL oracle replaying
the chain of iterations reproduces the scores bit-for-bit — the
`textrank_keywords` entry chains one CTE per iteration in DuckDB.

Scale design: the graph is VOCAB-sized (the corpus collapses to
weighted bigram counts in one shuffle); per-iteration work is one
co-keyed join + groupBy over that edge table, materialized once with
total weights attached; per-round localCheckpoint truncates lineage.
Undirected co-occurrence edges mean no dangling mass to track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def textrank_keywords(docs: DataFrame, min_edge_count: int = 3,
                      damping: float = 0.85, num_iter: int = 5,
                      k: int = 20, round_digits: int = 9,
                      text_col: str = "text") -> DataFrame:
    """-> (term, score round 6, degree) top-k terms by TextRank,
    ordered by (score desc, term asc)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping {damping} not in (0, 1)")
    if num_iter < 1 or k < 1:
        raise ValueError("num_iter and k must be >= 1")
    from osc_geo_h3grid_srv_spark.operators.collocations import (
        _bigram_relation)
    bg = (_bigram_relation(docs, text_col)
          .filter((F.col("n") >= min_edge_count)
                  & (F.col("left") != F.col("right"))))
    # undirected: merge both directions' counts into one symmetric
    # weight per unordered pair, then emit both orientations
    und = (bg.select(F.least("left", "right").alias("u"),
                     F.greatest("left", "right").alias("v"), "n")
           .groupBy("u", "v").agg(F.sum("n").alias("w")))
    edges = (und.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                        "w")
             .union(und.select(F.col("v").alias("src"),
                               F.col("u").alias("dst"), "w")))
    tot = edges.groupBy("src").agg(F.sum("w").alias("wtot"))
    ew = (edges.join(tot, "src")
          .select("src", "dst", (F.col("w").cast("double")
                                 / F.col("wtot").cast("double"))
                  .alias("share"))
          .localCheckpoint(eager=True))
    nodes = ew.select(F.col("src").alias("term")).distinct() \
        .localCheckpoint(eager=True)
    d = float(damping)
    scores = nodes.select("term", F.lit(1.0).alias("score")) \
        .localCheckpoint(eager=True)
    for _ in range(num_iter):
        contrib = (ew.join(scores, ew.src == scores.term)
                   .select("dst",
                           (F.col("share") * F.col("score")).alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("contrib")))
        scores = (nodes.join(contrib, nodes.term == contrib.dst, "left")
                  .select("term",
                          F.round(F.lit(1.0 - d)
                                  + F.lit(d)
                                  * F.coalesce(F.col("contrib"),
                                               F.lit(0.0)),
                                  round_digits).alias("score"))
                  .localCheckpoint(eager=True))
    deg = (ew.groupBy("src").agg(F.count("*").cast("long")
                                 .alias("degree"))
           .withColumnRenamed("src", "term"))
    return (scores.join(deg, "term")
            .select("term", F.round("score", 6).alias("score"), "degree")
            .orderBy(F.col("score").desc(), F.col("term").asc())
            .limit(k))
