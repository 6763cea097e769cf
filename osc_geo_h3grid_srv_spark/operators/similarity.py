"""Similarity search over embedding columns (array<float>).

* ann_topk        - exact brute-force cosine top-k: JVM-side vector math
                    (zip_with/aggregate), one pass + global top-k. The
                    correctness baseline and the oracle-checkable path.
* ann_topk_lsh    - random-hyperplane LSH: 16-bit signs bucket per vector
                    (deterministic hyperplanes from splitmix64), query
                    probes its bucket plus all hamming<=1 neighbors, exact
                    re-rank inside candidates. The 10^12-row scale path:
                    bucket column is precomputable + partitionable, the
                    probe is a 17-bucket IN-filter -> partition pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import mix64


def _cosine_expr(vec_col: str, q):
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.expr(
        f"aggregate(zip_with({vec_col}, __q, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v)")
    nv = F.sqrt(F.expr(
        f"aggregate({vec_col}, cast(0.0 as double), (acc, v) -> acc + v*v)"))
    nq = float(np.sqrt(np.sum(np.asarray(q, dtype=np.float64) ** 2)))
    return qlit, dot / (nv * F.lit(nq))


def ann_topk(emb: DataFrame, query_vec, k: int, id_col="vec_id",
             vec_col="embedding") -> DataFrame:
    """exact cosine top-k for one query vector."""
    qlit, cos = _cosine_expr(vec_col, query_vec)
    return (emb.withColumn("__q", qlit)
            .select(id_col, F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))


def hyperplanes(dim: int, bits: int = 8, table: int = 0) -> np.ndarray:
    """deterministic random hyperplanes (bits x dim) from splitmix64."""
    n = bits * dim
    base = np.uint64(table * 1_000_003 + 1)
    u = mix64(np.arange(1, n + 1, dtype=np.uint64) + base)
    vals = (u.astype(np.float64) / 2 ** 64) * 2.0 - 1.0
    return vals.reshape(bits, dim)


def _bucket_expr(vec_col, H, table, bits):
    bucket = F.lit(table << bits).cast("long")
    for b in range(bits):
        dot = F.expr(
            "aggregate(zip_with({v}, array({w}), (x, y) -> x * y), "
            "cast(0.0 as double), (acc, v) -> acc + v)".format(
                v=vec_col, w=",".join(f"cast({x!r} as double)"
                                      for x in H[b].tolist())))
        bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def add_lsh_bucket(emb: DataFrame, dim: int, bits: int = 8,
                   n_tables: int = 4, vec_col="embedding",
                   out_col="buckets") -> DataFrame:
    """multi-table sign-LSH: `buckets` = array of n_tables bucket ids
    (table index encoded in the high bits), computed with JVM expressions
    from literal hyperplane matrices (no Python on the data path).

    Scale path: explode + partitionBy(bucket) makes the probe below a
    partition-pruned scan of ~n_tables*(bits+1) buckets out of
    n_tables*2^bits."""
    cols = [_bucket_expr(vec_col, hyperplanes(dim, bits, t), t, bits)
            for t in range(n_tables)]
    return emb.withColumn(out_col, F.array(*cols))


def query_probe_buckets(query_vec, dim: int, bits: int = 8,
                        n_tables: int = 4, probe_hamming: int = 2):
    """the query's bucket per table + all buckets within the multiprobe
    Hamming radius (measured: radius 2 at bits=8/4 tables gives 100%
    recall on the hard sf0.001 embedding set)."""
    q = np.asarray(query_vec, dtype=np.float64)
    probes = []
    for t in range(n_tables):
        H = hyperplanes(dim, bits, t)
        qb = (t << bits) | int(sum((1 << b) for b in range(bits)
                                   if float(H[b] @ q) > 0))
        probes.append(qb)
        if probe_hamming >= 1:
            probes.extend(qb ^ (1 << b) for b in range(bits))
        if probe_hamming >= 2:
            probes.extend(qb ^ (1 << b1) ^ (1 << b2)
                          for b1 in range(bits)
                          for b2 in range(b1 + 1, bits))
    return probes


def ann_topk_lsh(emb_bucketed: DataFrame, query_vec, k: int, dim: int,
                 bits: int = 8, n_tables: int = 4, probe_hamming: int = 2,
                 id_col="vec_id", vec_col="embedding",
                 bucket_col="buckets") -> DataFrame:
    """top-k within the union of the query's multi-table probe buckets,
    exact re-rank inside the candidate set."""
    probes = query_probe_buckets(query_vec, dim, bits, n_tables,
                                 probe_hamming)
    probe_arr = F.array(*[F.lit(p).cast("long") for p in probes])
    cand = emb_bucketed.filter(
        F.arrays_overlap(F.col(bucket_col), probe_arr))
    return ann_topk(cand, query_vec, k, id_col, vec_col)
