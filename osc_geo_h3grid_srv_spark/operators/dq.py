"""Data-quality constraint audit — declarative table checks evaluated
in as few passes as the check set allows, the Deequ/Great-Expectations
shape (both public) a lakehouse pipeline runs before promoting a
snapshot: primary-key uniqueness, null rates, domain membership,
range predicates, and referential integrity.

Output is one row per check: (check, violations, total, pass) —
a relation, so audits join straight into job-gating logic or land in
a metrics table, no driver-side inspection required.

Plan shape (the 100 TB story):

* every ROW-LOCAL check against one table (null / domain / range)
  fuses into a SINGLE conditional-aggregate pass — one scan, one
  1-row partial+final aggregate, regardless of how many checks ride
  it; adding a check adds a codegen expression, not a pass;
* uniqueness = count(*) - count(distinct key) on the same scan family
  (its own aggregate: distinct-count rewrites to a two-stage partial
  aggregate, never a window);
* referential integrity = LEFT ANTI join against the referenced key
  set (broadcast when the dimension is small — orphan checks against
  Zipf-small dimensions never shuffle the fact table) followed by a
  1-row count;
* the per-check rows (each a 1-row aggregate) union into the report —
  the union is check-count-sized, trivially cheap.

No reference-repo counterpart (the reference validates eagerly inside
its loader, e.g. type checks in loader CSV handling); the audit
semantics here are the public Deequ constraint definitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(check: str, violations: Column, total: Column):
    return [F.lit(check).alias("check"),
            violations.cast("long").alias("violations"),
            total.cast("long").alias("total")]


def audit_checks(df: DataFrame,
                 not_null: list[str] = (),
                 unique: list[str] = (),
                 domain: dict[str, list] | None = None,
                 predicate: dict[str, Column] | None = None) -> DataFrame:
    """row-local + uniqueness checks over ONE table.

    not_null: columns that must never be NULL (one check per column).
    unique:   columns whose values must be distinct (NULLs ignored,
              matching SQL UNIQUE semantics).
    domain:   column -> allowed-values list (NULL counts as violation;
              pair with not_null when NULL is separately legal).
    predicate: check-name -> boolean Column that must hold on every
              row (NULL/false = violation, so NULLs can't hide).

    -> (check, violations, total, pass), check names are
    'not_null:<col>' / 'unique:<col>' / 'domain:<col>' / '<name>'.
    """
    domain = domain or {}
    predicate = predicate or {}
    aggs, names = [], []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)))
    for c, allowed in domain.items():
        names.append(f"domain:{c}")
        aggs.append(F.sum(
            F.when(F.col(c).isin(list(allowed)), 0).otherwise(1)))
    for name, cond in predicate.items():
        names.append(name)
        aggs.append(F.sum(F.when(cond, 0).otherwise(1)))
    for c in unique:
        names.append(f"unique:{c}")
        aggs.append(F.count(F.col(c)) - F.countDistinct(F.col(c)))
    if not names:
        raise ValueError("no checks requested")
    one = df.agg(F.count(F.lit(1)).alias("__total"),
                 *[a.alias(f"__v{i}") for i, a in enumerate(aggs)])
    parts = [one.select(*_report_row(nm, F.col(f"__v{i}"),
                                     F.col("__total")))
             for i, nm in enumerate(names)]
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionAll(p)
    return rep.withColumn("pass", F.col("violations") == 0)


def audit_foreign_key(fact: DataFrame, fact_key: str,
                      dim: DataFrame, dim_key: str,
                      check: str | None = None,
                      broadcast_dim: bool = True) -> DataFrame:
    """referential-integrity check: fact rows (with a non-NULL key)
    whose key has no match in the dimension. -> same report schema.
    NULL fact keys are not orphans (SQL FK semantics); add a
    not_null check if NULLs are illegal too."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    rows = fact.filter(F.col(fact_key).isNotNull())
    orphans = rows.join(keys, fact_key, "left_anti")
    nm = check or f"fk:{fact_key}"
    v = orphans.agg(F.count(F.lit(1)).alias("__v"))
    t = rows.agg(F.count(F.lit(1)).alias("__total"))
    one = v.crossJoin(F.broadcast(t))
    return (one.select(*_report_row(nm, F.col("__v"),
                                    F.col("__total")))
            .withColumn("pass", F.col("violations") == 0))
