"""Winnowing document fingerprints (public algorithm: Schleimer,
Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the MOSS selection rule): hash every
token k-gram, slide a window of w consecutive hashes, and keep the
minimum of each window (rightmost on ties). The guarantee: any shared
substring of length >= w+k-1 tokens contributes at least one COMMON
fingerprint to both documents, while only ~2/(w+1) of all gram hashes
are stored — the locality property plain min-hash/rolling-min
fingerprints (functions/text.py rolling_fingerprint) don't have, and
the standard index for partial-copy / excerpt detection at corpus
scale.

Engine-portable hashing and selection (everything replayable in SQL):

* gram hash h = hexint(md5(gram)[0:8]) — 32-bit range, identical in
  any engine with md5 (same trick as operators/sampling.py).
* "minimum, rightmost on ties, over a trailing window" collapses to
  ONE window-min over the packed key
      key = h * 2^30 + (2^30 - 1 - pos)
  (pos < 2^30; see _POS_BITS): minimizing key minimizes h and, on equal h,
  maximizes pos. h and pos decode back out of the selected key by
  div/mod — exact integer arithmetic end to end, no float anywhere.
* short docs (fewer than w grams) keep their global-min gram, so every
  document with >= k tokens carries at least one fingerprint.

Scale shape: gram hashing is a codegen array transform (no Python);
the only shuffle is the per-doc window partition (docs are
independent); the distinct over selected keys is per-doc via the same
partitioning. Fingerprint-keyed joins (find shared excerpts) then
shuffle only the winnowed ~2/(w+1) sample of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 30 position bits: docs up to 2^30 grams (far beyond any real
# document) while h * 2^30 + pos stays under 2^62 — exact BIGINT
# arithmetic in both engines (the packed key never touches a double)
_POS_BITS = 30
_POS_SPAN = 1 << _POS_BITS


def gram_hash_positions(docs: DataFrame, k: int,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, n_grams, pos, h): one row per token k-gram, pos 0-based,
    h = 32-bit md5-prefix hash of the space-joined lowercased gram."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = docs.select(
        id_col, F.split(F.lower(F.col(text_col)), " ").alias("t"))
    hs = F.expr(
        f"case when size(t) >= {k} then "
        f"transform(sequence(1, size(t) - {k} + 1), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', "
        f"slice(t, i, {k}))), 1, 8), 16, 10) as bigint)) "
        f"else cast(array() as array<bigint>) end")
    g = toks.select(id_col, F.posexplode(hs).alias("pos", "h"))
    return (g.withColumn("n_grams",
                         F.count("*").over(Window.partitionBy(id_col)))
            .withColumn("pos", F.col("pos").cast("long")))


def winnow_fingerprints(docs: DataFrame, k: int = 4, w: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, pos, h) of the selected fingerprints — the winnowed sample
    to index for partial-copy detection."""
    if w <= 0:
        raise ValueError(f"w must be positive, got {w}")
    g = gram_hash_positions(docs, k, id_col, text_col)
    key = (F.col("h") * F.lit(_POS_SPAN)
           + (F.lit(_POS_SPAN - 1) - F.col("pos")))
    frame = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(-(w - 1), 0))
    sel = (g.withColumn("minkey", F.min(key).over(frame))
           # full windows only, except short docs keep their last
           # window (which spans every gram) so they still yield a
           # fingerprint
           .filter(F.col("pos") >= F.least(F.lit(w),
                                           F.col("n_grams")) - 1)
           .select(id_col, "minkey").distinct())
    return sel.select(
        id_col,
        (F.lit(_POS_SPAN - 1) - F.col("minkey") % _POS_SPAN)
        .cast("long").alias("pos"),
        F.expr(f"minkey div {_POS_SPAN}").cast("long").alias("h"))


def fingerprint_stats(docs: DataFrame, k: int = 4, w: int = 5,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """per-doc rollup: (id, n_fp, fp_checksum, density) where density
    = n_fp / n_grams (theory: ~2/(w+1)); checksum is the exact bigint
    sum of selected hashes (each < 2^32 -> no overflow below 2^31
    fingerprints per doc)."""
    fp = winnow_fingerprints(docs, k, w, id_col, text_col)
    g = (gram_hash_positions(docs, k, id_col, text_col)
         .groupBy(id_col).agg(F.max("n_grams").alias("n_grams")))
    agg = fp.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_fp"),
        F.sum("h").cast("long").alias("fp_checksum"))
    return (agg.join(g, id_col)
            .select(id_col, "n_grams", "n_fp", "fp_checksum",
                    F.round(F.col("n_fp") / F.col("n_grams"), 6)
                    .alias("density")))
