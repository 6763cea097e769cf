"""Context-window chunking and sequence packing for training pipelines.

After filtering/dedup, a pretraining pipeline reshapes documents into
fixed-length training sequences. Two public-standard steps:

* CHUNKING: slide a token window (with overlap) over each document —
  long docs become several training samples. Embarrassingly parallel:
  per-row JVM array ops (split / sequence / slice) + one explode, no
  shuffle at all.

* PACKING (concat-and-split): documents are concatenated in a fixed
  order and cut every `seq_len` tokens; each document is assigned to
  the bin where its first token lands. The order must be deterministic
  (re-runs assign identically). A single global order would serialize
  — one window partition — so packing is done PER SHARD (any stable
  sharding column: path, bucket, hash(doc_id) % k). Shards pack
  independently and in parallel, which is exactly how file-sharded
  corpora are packed in practice; within a shard it is one ordered
  window cumulative sum.

Both are pure DataFrame expressions replayed verbatim by the DuckDB
oracles (range / list slicing / window SUM); no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """explode each doc into overlapping token windows; returns
    (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text). The final
    window may be shorter (tail). step = chunk_tokens - overlap."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"{overlap} / {chunk_tokens}")
    step = chunk_tokens - overlap
    starts = F.expr(
        f"sequence(0, greatest(size(split({text_col}, ' ')) - 1, 0), "
        f"{step})")
    d = docs.select(F.col(id_col), F.col(text_col),
                    F.posexplode(starts).alias("chunk_id", "chunk_start"))
    piece = F.expr(
        f"slice(split({text_col}, ' '), chunk_start + 1, {chunk_tokens})")
    return d.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


def pack_sequences(docs: DataFrame, seq_len: int = 256,
                   shard_col: str = "shard", id_col: str = "doc_id",
                   n_tokens_col: str = "n_tokens") -> DataFrame:
    """concat-and-split bin assignment: within each shard, docs ordered
    by id are virtually concatenated and cut every seq_len tokens; a
    doc's bin is where its FIRST token lands. Returns one row per
    (shard, bin): n_docs, tokens_total, and the bin's fill ratio
    against seq_len (last bin of a shard may underfill)."""
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assigned = docs.select(
        shard_col, id_col, F.col(n_tokens_col),
        (F.floor((F.sum(n_tokens_col).over(w) - F.col(n_tokens_col))
                 / F.lit(seq_len)).cast("bigint")).alias("bin"))
    return (assigned.groupBy(shard_col, "bin")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(n_tokens_col).cast("bigint").alias("tokens_total"))
            .withColumn("fill_ratio",
                        F.round(F.col("tokens_total") / F.lit(seq_len),
                                6)))


def assign_shards(docs: DataFrame, n_shards: int, salt: str = "shuf1",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment —
    the writer-side step that turns a curated corpus into N output
    shards in a reproducible pseudorandom order (training loaders read
    shards sequentially, so the shuffle must happen HERE, and re-runs /
    resumed writers must produce byte-identical shards).

    No global sort and no rand(): shard = hexint(md5(salt|id)[0:8]) mod
    n_shards (uniform in expectation), position within a shard = rank of
    the full md5 digest — ONE shuffle keyed by shard, each shard orders
    independently (the per-shard sort is the window's local sort, never
    a corpus-wide range exchange). Changing the salt redraws the whole
    order; keeping it pins every (shard, pos) across re-runs, which is
    what makes `write.partitionBy(shard)` resumable and auditable.

    Returns the input plus (shard, pos) with pos 0-based per shard."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.md5(F.concat(F.lit(salt), F.lit("|"),
                         F.col(id_col).cast("string")))
    df = docs.withColumn("__key", key).withColumn(
        "shard",
        (F.conv(F.substring("__key", 1, 8), 16, 10).cast("long")
         % n_shards).cast("long"))
    w = Window.partitionBy("shard").orderBy(F.col("__key").asc(),
                                            F.col(id_col).asc())
    return (df.withColumn("pos", (F.row_number().over(w) - 1)
                          .cast("long"))
            .drop("__key"))
