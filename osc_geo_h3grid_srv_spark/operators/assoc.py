"""Pairwise association rules over per-entity item baskets — the
market-basket / co-behavior primitive (Agrawal & Srikant VLDB 1994
frame it; the pairwise case needs no Apriori lattice) an analytics
engine is expected to answer over an event stream: "users who do A
also do B" with support / confidence / lift, the inputs to
recommendation heuristics, funnel design, and anomaly triage.

Scope is deliberately the PAIRWISE rule set: itemsets of size 2 cover
the overwhelming share of production rule queries, and the pair space
is |items|^2-bounded — never corpus-sized — so the whole computation
stays exact at any row count. (Higher-order mining bolts onto the
same basket relation; it is not this operator.)

Plan shape (the 100 TB story):

* the raw stream collapses FIRST to the distinct (entity, item)
  basket relation — one partial-aggregated exchange keyed by entity;
  every later step runs on baskets, never on raw events;
* pair counts come from a self-equi-join of baskets on entity — the
  per-entity fan-out is bounded by the per-entity distinct-item count
  (≤ |items|), so the join output is Σ b_i², not corpus²;
* per-item counts and the entity total are one groupBy + one 1-row
  aggregate, broadcast back onto the |items|²-sized pair relation —
  the big relation is never reshuffled for the denominators.

No reference-repo counterpart (the reference has no basket
analytics); the algorithm definitions are the public Agrawal/Srikant
ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(df: DataFrame, entity_col: str, item_col: str,
                      min_support: float = 0.0,
                      min_pair_n: int = 1) -> DataFrame:
    """-> (antecedent, consequent, n_both, support, confidence, lift)
    for every ORDERED item pair whose co-occurrence clears the
    thresholds; both rule directions are emitted (confidence is
    direction-dependent, support/lift are symmetric).

      support(a=>b)    = n(a,b) / N            (N = distinct entities)
      confidence(a=>b) = n(a,b) / n(a)
      lift(a=>b)       = confidence / (n(b) / N)

    All three are round(6) doubles over exact integer counts, so an
    independent SQL engine reproduces them bit-for-bit.
    """
    if not 0.0 <= min_support <= 1.0:
        raise ValueError(f"min_support {min_support} not in [0, 1]")
    if min_pair_n < 1:
        raise ValueError(f"min_pair_n {min_pair_n} must be >= 1")
    baskets = (df.select(F.col(entity_col).alias("ent"),
                         F.col(item_col).alias("item"))
               .filter(F.col("item").isNotNull())
               .distinct())
    n_ent = baskets.agg(F.countDistinct("ent").cast("long").alias("n"))
    item_n = (baskets.groupBy("item")
              .agg(F.count("*").cast("long").alias("n_item")))
    a = baskets.select("ent", F.col("item").alias("antecedent"))
    b = baskets.select("ent", F.col("item").alias("consequent"))
    pairs = (a.join(b, "ent")
             .filter(F.col("antecedent") != F.col("consequent"))
             .groupBy("antecedent", "consequent")
             .agg(F.count("*").cast("long").alias("n_both")))
    out = (pairs
           .join(F.broadcast(item_n.select(
               F.col("item").alias("antecedent"),
               F.col("n_item").alias("__na"))), "antecedent")
           .join(F.broadcast(item_n.select(
               F.col("item").alias("consequent"),
               F.col("n_item").alias("__nb"))), "consequent")
           .crossJoin(F.broadcast(n_ent)))
    out = out.select(
        "antecedent", "consequent", "n_both",
        F.round(F.col("n_both") / F.col("n"), 6).alias("support"),
        F.round(F.col("n_both") / F.col("__na"), 6).alias("confidence"),
        F.round((F.col("n_both") / F.col("__na"))
                / (F.col("__nb") / F.col("n")), 6).alias("lift"))
    return out.filter((F.col("support") >= float(min_support))
                      & (F.col("n_both") >= int(min_pair_n)))
