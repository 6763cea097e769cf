"""Skew handling for H3 cell joins (north_rule: dense web-page geo
clusters make city cells hot; SURVEY.md SS4.2 item 3).

Two layers:
* AQE skew-join splitting is ON globally (engine.make_spark) — it
  re-splits oversized shuffle partitions at runtime and is the first
  line of defense.
* `salted_equi_join` is the explicit strategy for joins where one side
  is both BIG and SKEWED on the join key (so broadcast is impossible
  and a single hot key would still bottleneck one task chain): the big
  side gets a deterministic salt in [0, S); the small side is exploded
  S times; the join key becomes (key, salt), spreading each hot key
  over S tasks. Row multiset is identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(big: DataFrame, small: DataFrame, big_key, small_key,
                     salt: int = 8, how: str = "inner",
                     salt_src=None) -> DataFrame:
    """equi-join big.big_key == small.small_key with an S-way salt.

    salt_src: BIG-side column (name or Column) the salt is hashed from.
    It must vary WITHIN a hot key to spread it, so pass a row-unique
    column (id, url) when one exists. The fallback hashes
    monotonically_increasing_id — deterministic for a given task
    layout, and safe regardless: any salt assignment yields the same
    join rows, it only affects balance.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # exploding the small side S ways would duplicate its unmatched
        # rows S times under right/full outer semantics
        raise ValueError(
            f"salted_equi_join supports inner/left/semi/anti joins, "
            f"not {how!r}")
    if salt_src is None:
        salt_col = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                          F.lit(int(salt)))
    else:
        salt_col = F.pmod(
            F.xxhash64(F.col(salt_src) if isinstance(salt_src, str)
                       else salt_src), F.lit(int(salt)))
    b = big.withColumn("__salt", salt_col.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(int(salt))])))
    # qualify the keys via the per-side frames so a shared column name
    # does not raise AMBIGUOUS_REFERENCE
    bk = b[big_key] if isinstance(big_key, str) else big_key
    sk = s[small_key] if isinstance(small_key, str) else small_key
    out = b.join(s, (bk == sk) & (b["__salt"] == s["__salt"]), how)
    return out.drop("__salt")
