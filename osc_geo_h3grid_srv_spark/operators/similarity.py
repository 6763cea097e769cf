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
import pandas as pd
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


def _buckets_arrow_udf(dim: int, bits: int, n_tables: int):
    """all n_tables bucket ids in one Arrow-vectorized matmul: stack the
    batch to (n, dim) float64, one X @ H_all.T against the concatenated
    (n_tables*bits, dim) hyperplane matrix, pack sign bits per table.

    Hyperplanes travel in the UDF closure, not as literals — the expr
    path's dim*bits*n_tables literal casts (2048 nodes at 64x8x4) cost
    Catalyst seconds of ANALYSIS before a single row moves (measured
    8.7 s on a 2000-row input; this path: <1 s). Summation order
    (pairwise BLAS here vs the expr path's left fold vs the DuckDB
    oracle's list_dot_product) only matters within ~1e-13 of a sign
    boundary; the oracle already mixes orders and the cross-impl
    equality test pins agreement on real corpora."""
    from pyspark.sql.functions import pandas_udf

    h_all = np.vstack([hyperplanes(dim, bits, t)
                       for t in range(n_tables)])      # (T*bits, dim)
    pack = (np.int64(1) << np.arange(bits, dtype=np.int64))
    tags = (np.arange(n_tables, dtype=np.int64) << bits)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        rows = [np.zeros(dim, dtype=np.float64) if x is None
                else np.asarray(x, dtype=np.float64) for x in v]
        if not rows:
            return pd.Series([], dtype=object)
        x = np.stack(rows)                              # (n, dim)
        signs = (x @ h_all.T) > 0.0                     # (n, T*bits)
        ids = (signs.reshape(len(x), n_tables, bits)
               .astype(np.int64) @ pack) + tags         # (n, T)
        return pd.Series(ids.tolist())

    return buckets


def add_lsh_bucket(emb: DataFrame, dim: int, bits: int = 8,
                   n_tables: int = 4, vec_col="embedding",
                   out_col="buckets", impl: str = "arrow") -> DataFrame:
    """multi-table sign-LSH: `buckets` = array of n_tables bucket ids
    (table index encoded in the high bits).

    impl='arrow' (default): one vectorized matmul per Arrow batch — the
    hot path (see _buckets_arrow_udf for why the literal expression tree
    loses). impl='expr': pure-JVM literal expressions, kept as the
    zero-Python reference path and the cross-impl equality gate's other
    half (tests/test_dedup_similarity.py pins arrow == expr buckets).

    Scale path: explode + partitionBy(bucket) makes the probe below a
    partition-pruned scan of ~n_tables*(bits+1) buckets out of
    n_tables*2^bits."""
    if impl == "expr":
        cols = [_bucket_expr(vec_col, hyperplanes(dim, bits, t), t, bits)
                for t in range(n_tables)]
        return emb.withColumn(out_col, F.array(*cols))
    if impl != "arrow":
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    udf = _buckets_arrow_udf(dim, bits, n_tables)
    return emb.withColumn(out_col, udf(F.col(vec_col)))


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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cluster-partitioned scale path
# ---------------------------------------------------------------------------

def ivf_seed_centroids(dim: int, n_lists: int, seed: int = 1234):
    """deterministic unit-norm seed centroids (n_lists x dim) from
    splitmix64 — same numerals on any machine (no RNG state)."""
    base = (int(seed) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    idx = (np.arange(n_lists * dim, dtype=np.uint64) + np.uint64(base))
    u = (mix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    c = (u.reshape(n_lists, dim) - 0.5)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _dot_expr(vec_col, centroid):
    # string-literal casts: immune to repr()'s scientific notation
    clit = ", ".join(f"cast('{float(x)!r}' as double)" for x in centroid)
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({clit}), (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v)")


def ivf_assign(emb: DataFrame, centroids, vec_col="embedding",
               out_col="ivf_list") -> DataFrame:
    """nearest-centroid (max dot product; centroids unit-norm so this is
    max cosine for any input norm ranking) — pure JVM expressions, one
    pass, no shuffle. Ties break to the lower list id
    (array_position returns the FIRST match).

    Plan-size note: a chained when(d_i > best, ...) nests the previous
    tree at every step (exponential blowup; measured 40s+ analysis on 8
    lists x 64 dims); array_position(ds, array_max(ds)) keeps exactly
    two copies of the dot array."""
    ds = F.array(*[_dot_expr(vec_col, c) for c in centroids])
    idx = (F.array_position(ds, F.array_max(ds)) - 1).cast("int")
    return emb.withColumn(out_col, idx)


def ivf_refine(emb: DataFrame, centroids, iters: int = 3,
               vec_col="embedding") -> np.ndarray:
    """Lloyd refinement on DataFrames: assign (JVM) -> per-list mean via
    posexplode + groupBy(list, pos) avg (partial aggregation; scales to
    any row count) -> renormalize. Empty lists keep their centroid."""
    cents = np.asarray(centroids, dtype=np.float64)
    for _ in range(int(iters)):
        a = ivf_assign(emb, cents, vec_col=vec_col)
        rows = (a.select("ivf_list",
                         F.posexplode(vec_col).alias("pos", "v"))
                .groupBy("ivf_list", "pos")
                .agg(F.avg("v").alias("m"))
                .collect())
        nxt = cents.copy()
        seen = set()
        for r in rows:
            nxt[r["ivf_list"], r["pos"]] = r["m"]
            seen.add(r["ivf_list"])
        for li in seen:
            n = np.linalg.norm(nxt[li])
            if n > 0:
                nxt[li] = nxt[li] / n
        cents = nxt
    return cents


def ivf_inertia(emb: DataFrame, centroids, vec_col="embedding") -> float:
    """sum over rows of (1 - cos(row, nearest centroid)) — the quantity
    Lloyd iterations must not increase (test invariant)."""
    best = F.array_max(
        F.array(*[_dot_expr(vec_col, c) for c in centroids]))
    nv = F.sqrt(F.expr(
        f"aggregate({vec_col}, cast(0.0 as double), "
        "(acc, v) -> acc + v*v)"))
    return float(emb.select(
        F.sum(F.lit(1.0) - best / nv).alias("s")).collect()[0]["s"])


def ann_topk_ivf(emb_assigned: DataFrame, query_vec, centroids, k: int,
                 n_probe: int = 4, id_col="vec_id",
                 vec_col="embedding", list_col="ivf_list") -> DataFrame:
    """IVF search: rank lists by centroid dot with the query, scan only
    the n_probe nearest lists (an IN-filter on the list column -> file
    pruning when the table is partitioned by it), exact cosine re-rank
    inside the candidates."""
    q = np.asarray(query_vec, dtype=np.float64)
    # stable sort: centroid-score ties resolve to the lower list id
    # (deterministic, and exactly replayable as ORDER BY d DESC, i ASC)
    order = np.argsort(-(np.asarray(centroids) @ q), kind="stable")
    probes = [int(i) for i in order[:int(n_probe)]]
    cand = emb_assigned.filter(F.col(list_col).isin(probes))
    return ann_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------- PQ --

def pq_seed_codebooks(dim: int, m: int, k: int, seed: int = 77):
    """deterministic product-quantization codebooks: (m, k, dim//m)
    splitmix64-derived float64 numerals (same on any machine), NOT
    normalized — PQ centroids live in data space, and argmin-L2 works
    for any placement. dim must divide evenly into m subspaces."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    base = (int(seed) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    idx = (np.arange(m * k * sub, dtype=np.uint64) + np.uint64(base))
    u = (mix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return (u.reshape(m, k, sub) - 0.5) * 0.25


def pq_half_sq(c) -> float:
    """||c||^2 / 2 with SEQUENTIAL double arithmetic — the one numeral
    shared by encode, ADC lookup, and the DuckDB replay."""
    s = 0.0
    for x in c:
        s += float(x) * float(x)
    return 0.5 * s


def _pq_sub_scores(vec_col: str, cb_j, start: int, sub: int):
    """array of K per-code scores for ONE subspace: dot(x_sub, c) -
    ||c||^2/2 (argmax of this == argmin L2 distance; the ||x_sub||^2
    term is code-independent). String-literal double casts keep the
    numerals identical in the DuckDB replay."""
    exprs = []
    for c in cb_j:
        clit = ", ".join(f"cast('{float(x)!r}' as double)" for x in c)
        half = pq_half_sq(c)
        exprs.append(F.expr(
            f"aggregate(zip_with(slice({vec_col}, {start}, {sub}), "
            f"array({clit}), (x, y) -> x * y), cast(0.0 as double), "
            f"(acc, v) -> acc + v) - cast('{half!r}' as double)"))
    return F.array(*exprs)


def pq_encode(emb: DataFrame, codebooks, vec_col: str = "embedding",
              out_col: str = "pq_codes") -> DataFrame:
    """Product-quantization encoding (public method: Jegou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): split each
    vector into m subvectors, store only the index of the nearest
    codebook centroid per subspace — dim floats become m small ints,
    the memory move that makes 10^12-vector ANN feasible.

    Pure JVM expressions, one map-side pass, no shuffle: per subspace
    an array of K dot-product scores and a first-match argmax
    (array_position of array_max — same flat-plan trick as ivf_assign;
    ties to the lower code). Adds `out_col` = array<int> of m codes."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, _k, sub = cb.shape
    codes = []
    for j in range(m):
        scores = _pq_sub_scores(vec_col, cb[j], j * sub + 1, sub)
        codes.append((F.array_position(scores, F.array_max(scores)) - 1)
                     .cast("int"))
    return emb.withColumn(out_col, F.array(*codes))


def pq_adc_topk(encoded: DataFrame, query_vec, codebooks, k: int,
                id_col: str = "vec_id",
                codes_col: str = "pq_codes") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact; each candidate's distance is a sum of m table lookups. The
    per-subspace lookup tables (K entries each) are computed once
    driver-side with SEQUENTIAL double arithmetic (matches the SQL
    replay's evaluation order) and inlined as array literals — the scan
    reads ONLY the m-int code column, never the vectors: that is the
    whole point of PQ at 10^12 rows.

    Scores are similarities (dot(q_sub, c) - ||c||^2/2 summed over
    subspaces); max score == min L2 ADC distance since the
    ||q_sub||^2 terms are candidate-independent. Top-k compiles to
    TakeOrderedAndProject."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cb = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub = cb.shape
    q = [float(x) for x in query_vec]
    if len(q) != m * sub:
        raise ValueError(f"query dim {len(q)} != {m * sub}")
    terms = []
    for j in range(m):
        qs = q[j * sub:(j + 1) * sub]
        lut = []
        for c in cb[j]:
            s = 0.0
            for a, b in zip(qs, c):   # sequential: replayable order
                s += a * float(b)
            lut.append(s - pq_half_sq(c))
        llit = ", ".join(f"cast('{v!r}' as double)" for v in lut)
        terms.append(F.expr(
            f"element_at(array({llit}), "
            f"element_at({codes_col}, {j + 1}) + 1)"))
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return (encoded.withColumn("adc_score", score)
            .orderBy(F.col("adc_score").desc(), F.col(id_col).asc())
            .limit(k))
