"""Space-filling-curve data layout: Z-order (Morton) keys for
multi-dimensional file clustering — the public technique behind
"OPTIMIZE ZORDER BY" style layouts (Morton 1966; Bayer's UB-tree line
of work): sort/partition the corpus by the bit-interleaved key of the
query dimensions so file-level min/max statistics become selective for
BOTH dimensions at once, and a lat/lng (or any 2-D) range scan prunes
to a few files out of tens of thousands.

The key is pure integer bit-math (the classic parallel-prefix spread):

    spread(v):  v &= mask16; v = (v | v<<8) & 0x00FF00FF;
                v = (v | v<<4) & 0x0F0F0F0F; v = (v | v<<2) & 0x33...;
                v = (v | v<<1) & 0x55555555
    morton(x, y) = spread(x) | spread(y) << 1

so it runs as a whole-stage-codegen JVM projection in Spark AND
replays bit-for-bit in any SQL engine — the `zorder_layout_spans`
entry value-hash-gates the full pipeline (quantize -> interleave ->
bucket -> per-bucket bounding boxes) against DuckDB.

Scale notes: the key projection is shuffle-free; the layout write is
ONE repartitionByRange on the key (the same exchange any sorted write
needs); file pruning then happens at scan time from parquet footer
stats, with no index structure to maintain. The locality property the
pytest asserts (z-order buckets have ~sqrt-area bounding boxes vs
row-major stripes) is exactly what makes the 100 TB scan prunable.

No reference counterpart (the reference stores one dataset per DuckDB
file); public-literature technique only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) chain spreading a 16-bit int to even bit positions
_SPREAD = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
           (1, 0x55555555)]


def _spread_col(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, sh))).bitwiseAND(F.lit(mask))
    return v


def morton_key_2d(x: Column, y: Column) -> Column:
    """bit-interleaved Z-order key of two non-negative ints (<= 16
    bits each used): even bits from x, odd bits from y."""
    return _spread_col(x).bitwiseOR(F.shiftleft(_spread_col(y), 1))


def spread_sql(expr: str) -> str:
    """the identical spread chain as SQL text (for oracle replay)."""
    v = f"({expr} & 65535)"
    for sh, mask in _SPREAD:
        v = f"((({v} | ({v} << {sh})) & {mask}))"
    return v


def morton_sql(x_expr: str, y_expr: str) -> str:
    return f"({spread_sql(x_expr)} | ({spread_sql(y_expr)} << 1))"


def zorder_spans(df: DataFrame, qx: Column, qy: Column,
                 bucket_shift: int) -> DataFrame:
    """-> per-bucket layout statistics (bucket, n, x_min, x_max,
    y_min, y_max): bucket = morton(qx, qy) >> bucket_shift — i.e. the
    file a z-ordered range-partitioned write would put the row in,
    with the bounding box its parquet footer would carry."""
    if not 0 <= bucket_shift <= 62:
        raise ValueError(f"bucket_shift {bucket_shift} out of range")
    key = morton_key_2d(qx, qy)
    d = df.select(qx.alias("qx"), qy.alias("qy"),
                  F.shiftright(key, bucket_shift).alias("bucket"))
    return (d.groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.min("qx").alias("x_min"), F.max("qx").alias("x_max"),
                 F.min("qy").alias("y_min"), F.max("qy").alias("y_max")))


def layout_by_zorder(df: DataFrame, qx: Column, qy: Column,
                     n_partitions: int) -> DataFrame:
    """repartition the rows into n_partitions range-contiguous slices
    of the Z-order key — the write-side layout operator. The exchange
    is the single rangepartitioning any sorted write pays; downstream
    parquet files carry min/max stats selective in both dimensions."""
    if n_partitions < 1:
        raise ValueError(f"n_partitions {n_partitions} must be >= 1")
    keyed = df.withColumn("__zkey", morton_key_2d(qx, qy))
    return (keyed.repartitionByRange(n_partitions, F.col("__zkey"))
            .sortWithinPartitions("__zkey").drop("__zkey"))


# ---------------------------------------------------------------------------
# Hilbert curve: better locality than Z-order (no long diagonal jumps)
# ---------------------------------------------------------------------------

def with_hilbert_key(df: DataFrame, x: Column, y: Column,
                     order: int = 10, out: str = "hd") -> DataFrame:
    """Append the Hilbert curve distance `out` of grid point (x, y) on
    a 2^order x 2^order grid (Hilbert 1891; the classic xy2d bit
    algorithm as published in public references). Strictly better
    locality than Morton: consecutive keys are always 4-adjacent
    cells, so range reads never straddle the long diagonal seams
    Z-order has — the pytest quantifies this.

    The per-level rotate/reflect state machine unrolls to `order`
    rounds of withColumns projections over NAMED state columns
    (hx, hy, hd). Named references matter: inlining the recurrence as
    one Column would double the expression tree per level (4^order
    nodes — order 10 overflows the analyzer), while named per-level
    projections stay linear, and Catalyst's CollapseProject leaves
    them be because the state columns are referenced more than once.
    The identical unrolled chain renders to SQL via hilbert_sql_ctes()
    for the oracle replay (one CTE per level — the same linearization).
    """
    if not 1 <= order <= 31:
        raise ValueError(f"order {order} out of range")
    hx, hy = f"__{out}_hx", f"__{out}_hy"
    d = df.withColumns({hx: x.cast("long"), hy: y.cast("long"),
                        out: F.lit(0).cast("long")})
    s = 1 << (order - 1)
    while s > 0:
        rx = F.when(F.col(hx).bitwiseAND(F.lit(s)) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        ry = F.when(F.col(hy).bitwiseAND(F.lit(s)) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        # rotate quadrant: if ry == 0 { if rx == 1 reflect; swap x,y }
        d = d.withColumns({
            out: F.col(out)
            + F.lit(s) * F.lit(s) * (F.lit(3) * rx).bitwiseXOR(ry),
            hx: F.when(ry == 0,
                       F.when(rx == 1, F.lit(s - 1) - F.col(hy))
                       .otherwise(F.col(hy))).otherwise(F.col(hx)),
            hy: F.when(ry == 0,
                       F.when(rx == 1, F.lit(s - 1) - F.col(hx))
                       .otherwise(F.col(hx))).otherwise(F.col(hy)),
        })
        s //= 2
    return d.drop(hx, hy)


def hilbert_sql_ctes(x_expr: str, y_expr: str, source: str,
                     keep: list[str], order: int = 10
                     ) -> tuple[str, str]:
    """the identical unrolled xy2d chain as chained SQL CTEs (oracle
    replay): returns (cte_block, last_cte_name); the last CTE carries
    `keep` columns plus the final key column `hd`. Column references
    inside each SELECT resolve to the INPUT level (SQL semantics), so
    the per-level state (hx, hy, hd) can reuse its names — exactly the
    rebinding the Spark loop does."""
    if not 1 <= order <= 31:
        raise ValueError(f"order {order} out of range")
    ks = ", ".join(keep)
    ctes = [f"h0 as (select {ks}, ({x_expr})::bigint as hx, "
            f"({y_expr})::bigint as hy, 0::bigint as hd from {source})"]
    lvl = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = f"(case when (hx & {s}) > 0 then 1 else 0 end)"
        ry = f"(case when (hy & {s}) > 0 then 1 else 0 end)"
        ctes.append(
            f"h{lvl + 1} as (select {ks}, "
            f"case when {ry} = 0 then (case when {rx} = 1 "
            f"then {s - 1} - hy else hy end) else hx end as hx, "
            f"case when {ry} = 0 then (case when {rx} = 1 "
            f"then {s - 1} - hx else hx end) else hy end as hy, "
            f"hd + {s}::bigint * {s} * xor({rx} * 3, {ry}) as hd "
            f"from h{lvl})")
        lvl += 1
        s //= 2
    return ",\n".join(ctes), f"h{lvl}"


def hilbert_spans(df: DataFrame, qx: Column, qy: Column,
                  order: int, bucket_shift: int) -> DataFrame:
    """per-bucket layout statistics under HILBERT clustering — same
    contract as zorder_spans, bucket = hilbert_d >> bucket_shift."""
    if not 0 <= bucket_shift <= 62:
        raise ValueError(f"bucket_shift {bucket_shift} out of range")
    d = with_hilbert_key(df.select(qx.alias("qx"), qy.alias("qy")),
                         F.col("qx"), F.col("qy"), order)
    d = d.select("qx", "qy", F.shiftright(F.col("hd"), bucket_shift)
                 .alias("bucket"))
    return (d.groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.min("qx").alias("x_min"), F.max("qx").alias("x_max"),
                 F.min("qy").alias("y_min"), F.max("qy").alias("y_max")))
