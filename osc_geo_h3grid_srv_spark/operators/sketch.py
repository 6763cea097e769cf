"""Mergeable sketches for corpus-scale approximate analytics —
HyperLogLog distinct counting (Flajolet et al. 2007) and Count-Min
frequency estimation (Cormode & Muthukrishnan 2005), both implemented
as DETERMINISTIC, engine-portable relational plans rather than opaque
binary registers.

Why these exist next to exact groupBys: at 10^12 rows an exact
count-distinct of a high-cardinality key shuffles the key universe,
and a per-shard frequency table is the size of the vocabulary. Both
sketches reduce to FIXED-SIZE tables (64 HLL registers; d x w CMS
counters) that merge by max / sum — the shape you ship between shards,
snapshots, or days. Spark's built-in approx_count_distinct is the
JVM-native fast path; this module's value is that the sketch state is
a plain DataFrame any engine can rebuild bit-for-bit (md5-derived
hashes, integer arithmetic), so estimates are auditable and
oracle-checkable rather than implementation-defined.

Shared hashing: h = hexint(md5(salt|key)[0:8]) — 32 uniform bits,
identical in any engine with md5 (operators/sampling.py precedent).

HLL (m = 64 registers, b = 6 index bits): bucket = top 6 bits,
rho = leading-zero rank of the remaining 26 bits (bit-length via the
binary-string length, exact in both engines; rho(0) = 27). Registers
are a 64-row groupBy-max; the estimate is the standard bias-corrected
harmonic mean with the small-range linear-counting correction.

CMS (d rows, w buckets): counts are aggregated per distinct key FIRST
(one vocab-sized groupBy), then each key hashes into one bucket per
row — the d-fold fan-out touches the vocabulary, never the token
stream. Point estimate = min over rows; the classic one-sided
guarantee (estimate >= truth) holds by construction and is asserted in
tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 64          # registers
_HLL_B = 6          # index bits; 32 - 6 = 26 rho bits
_HLL_RHO_SPAN = 1 << 26
_HLL_ALPHA = 0.709  # alpha_64 (published constant for m = 64)


def _hash32(key: Column, salt: str) -> Column:
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"), key.cast("string"))),
        1, 8), 16, 10).cast("long")


def hll_registers(df: DataFrame, key: Column,
                  salt: str = "hll1") -> DataFrame:
    """(bucket, rho): the 64 HLL registers (absent bucket = 0)."""
    h = _hash32(key, salt)
    bucket = (h / F.lit(_HLL_RHO_SPAN)).cast("long")
    rest = h % F.lit(_HLL_RHO_SPAN)
    # leading-zero rank of a 26-bit value: 26 - bit_length(rest) + 1;
    # bit_length via length(bin(x)) is exact integer arithmetic (bin(0)
    # is '0' -> special-cased to rho = 27)
    rho = F.when(rest == 0, F.lit(26 + 1)).otherwise(
        F.lit(26 + 1) - F.length(F.bin(rest)))
    return (df.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """one row: (n_registers_hit, hll_estimate) from the register
    table. Standard HLL: E = alpha*m^2 / sum(2^-M_j) over ALL m
    registers (missing ones count 2^0 = 1); if E <= 2.5m and empty
    registers exist, fall back to linear counting m*ln(m/V)."""
    m = HLL_M
    agg = registers.agg(
        F.count("*").cast("long").alias("hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_hit"))
    s = F.col("s_hit") + (F.lit(m) - F.col("hit"))  # absent => 2^0
    raw = F.lit(_HLL_ALPHA * m * m) / s
    v = F.lit(m) - F.col("hit")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)
                 ).otherwise(raw)
    return agg.select(F.col("hit").alias("n_registers_hit"),
                      est.alias("hll_estimate"))


def cms_table(df: DataFrame, key: Column, d: int = 4, w: int = 256,
              salt: str = "cms1",
              weight: Column | None = None) -> DataFrame:
    """(row, bucket, total): the d x w Count-Min table. Exact per-key
    totals are aggregated FIRST (vocab-sized shuffle), then fanned out
    d ways — the token stream is never multiplied."""
    if d <= 0 or w <= 0:
        raise ValueError(f"d and w must be positive, got {d}, {w}")
    wcol = weight if weight is not None else F.lit(1)
    per_key = (df.select(key.alias("k"), wcol.alias("wt"))
               .groupBy("k").agg(F.sum("wt").cast("long").alias("c")))
    rows = F.explode(F.array(*[F.struct(
        F.lit(i).alias("row"),
        (_hash32(F.col("k"), f"{salt}{i}") % w).alias("bucket"))
        for i in range(d)]))
    fan = per_key.select("k", "c", rows.alias("rb"))
    return (fan.groupBy(F.col("rb.row").alias("row"),
                        F.col("rb.bucket").alias("bucket"))
            .agg(F.sum("c").cast("long").alias("total")))


def cms_point_estimates(cms: DataFrame, keys: list[str], d: int = 4,
                        w: int = 256, salt: str = "cms1") -> DataFrame:
    """(key, est): Count-Min point estimate (min over the d rows) for
    each query key — a broadcast of the tiny probe table against the
    fixed-size sketch."""
    import hashlib
    spark = cms.sparkSession
    probes = []
    for key in keys:
        for i in range(d):
            hx = hashlib.md5(f"{salt}{i}|{key}".encode()).hexdigest()
            probes.append((key, i, int(hx[:8], 16) % w))
    p = spark.createDataFrame(probes, "key string, row int, bucket long")
    j = p.join(cms, ["row", "bucket"], "left") \
        .withColumn("total", F.coalesce("total", F.lit(0)))
    return (j.groupBy("key")
            .agg(F.min("total").cast("long").alias("est")))


def bloom_bits(df: DataFrame, key: Column, k: int = 4, m: int = 4096,
               salt: str = "bf1") -> DataFrame:
    """(bit,): the set bit positions of a Bloom filter (Bloom 1970) over
    the distinct keys — the third classic mergeable sketch next to HLL
    and CMS, implemented with the same engine-portable md5 hashing so
    the state is a plain DataFrame any engine rebuilds bit-for-bit.

    Keys are distinct'd FIRST (vocab-sized shuffle), then fanned out k
    ways; the result is at most min(k * |keys|, m) rows of one long
    each. Filters merge by plain union+distinct (bitwise OR in
    relational form); membership has the classic one-sided guarantee —
    no false negatives, false-positive rate ~ (1 - e^(-k*n/m))^k."""
    if k <= 0 or m <= 0:
        raise ValueError(f"k and m must be positive, got {k}, {m}")
    keys = df.select(key.alias("k")).distinct()
    bits = F.explode(F.array(*[
        (_hash32(F.col("k"), f"{salt}{i}") % m)
        for i in range(k)])).alias("bit")
    return keys.select(bits).distinct()


def bloom_probe(bloom: DataFrame, keys: list[str], k: int = 4,
                m: int = 4096, salt: str = "bf1") -> DataFrame:
    """(key, maybe_present): a key is reported present iff ALL k of its
    bits are set — false negatives impossible, false positives bounded.
    The probe table is tiny and broadcast against the (at most m-row)
    bit table. Probe bits come from the SAME _hash32 expression
    composition bloom_bits uses (not a driver-side hashlib replica):
    any future change to the hash derivation moves both sides
    together, so the one-sided no-false-negatives guarantee can't be
    silently broken by a split-brain hash."""
    spark = bloom.sparkSession
    p = (spark.createDataFrame([(kk,) for kk in keys], "key string")
         .select("key", F.explode(F.array(*[
             (_hash32(F.col("key"), f"{salt}{i}") % m)
             for i in range(k)])).alias("bit")))
    j = p.join(bloom.withColumn("__set", F.lit(1)), ["bit"], "left")
    return (j.groupBy("key")
            .agg((F.count("*") == F.sum(F.coalesce("__set", F.lit(0))))
                 .alias("maybe_present")))
