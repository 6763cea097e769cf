"""Content-defined chunking (Gear-CDC) and chunk-level dedup.

The byte-level counterpart to the token-level span dedup
(operators/spandedup.py): split every payload at positions chosen by
the CONTENT (a Gear rolling hash hitting a mask), not by fixed
offsets, so an insertion or deletion only reshuffles the chunks around
the edit while every other chunk keeps its identity. This is the
public technique behind dedup storage systems and delta ingest
(Gear/FastCDC, Xia et al., USENIX ATC'16): two crawls of the same page
that differ by one edited paragraph share every chunk except the ones
the edit touches, so chunk-hash dedup recovers the redundancy that
whole-document hashing misses.

Rolling hash (32-bit Gear): h_i = (h_{i-1} * 2 + G[c_i]) mod 2^32 with
a fixed 256-entry random table G; bits shift out after 32 steps, so
h_i depends on exactly the last 32 characters — a boundary decision is
LOCAL. A position is a cut point when the low `mask_bits` of h are all
zero (expected chunk length 2^mask_bits), and the final position
always closes the last chunk. No min/max clamp is applied: keeping the
boundary rule a pure function of the trailing window means every
boundary is independently recomputable (the DuckDB oracle replays the
identical windowed sum), and chunks after ANY edit resynchronize
within one window.

Scale shape: chunking is one stateless mapInPandas pass (the rolling
hash is 32 shifted vector adds per payload, fully NumPy-vectorized —
no per-byte Python loop); dedup is a plain chunk-hash groupBy with
map-side partial aggregation. Nothing is ever keyed by chunk BYTES —
only by the 16-byte md5 — so the shuffle carries a few narrow rows per
chunk regardless of payload size.

The character unit is the Unicode codepoint reduced mod 256 for the
gear lookup (computed via a utf-32 reinterpretation, no Python loop),
and substrings are taken at character positions — this keeps the Spark
and SQL replicas aligned on any text without byte/char offset drift.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import mix64

#: fixed gear table: G[c] = low 32 bits of splitmix64(c + seed). The
#: DuckDB oracle embeds the same 256 values as literals
#: (gear_table_sql_values), so both engines cut at identical positions.
_GEAR_SEED = 0x9E2D_CDC0


_GEAR_CACHE = None


def gear_table() -> np.ndarray:
    # cached: _chunk_positions runs once per DOCUMENT — rebuilding a
    # constant 256-entry table per row is pure redundant work
    global _GEAR_CACHE
    if _GEAR_CACHE is None:
        _GEAR_CACHE = (mix64(np.arange(256, dtype=np.uint64)
                             + np.uint64(_GEAR_SEED))
                       & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return _GEAR_CACHE


def gear_table_sql_values() -> str:
    """the table as SQL VALUES rows `(code, gv)` for oracle replays."""
    g = gear_table()
    return ", ".join(f"({i}, {int(v)})" for i, v in enumerate(g))


def _chunk_positions(codes: np.ndarray, mask_bits: int,
                     window: int = 32) -> np.ndarray:
    """0-based END positions (inclusive) of each chunk. Vectorized:
    h_i = sum_{k=0..31} G[c_{i-k}] << k (mod 2^32) as 32 shifted adds."""
    g = gear_table()[codes]
    n = len(g)
    h = np.zeros(n, dtype=np.uint32)
    for k in range(min(window, n)):
        h[k:] += g[: n - k] << np.uint32(k)
    mask = np.uint32((1 << mask_bits) - 1)
    ends = np.flatnonzero((h & mask) == 0)
    if len(ends) == 0 or ends[-1] != n - 1:
        ends = np.append(ends, n - 1)
    return ends


def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", mask_bits: int = 5) -> DataFrame:
    """-> (doc_id, chunk_idx, chunk_start, chunk_len, chunk_hash) —
    chunk_start is 1-based (SQL substr convention), chunk_hash the md5
    hex of the chunk text. Empty/null texts produce no rows."""
    if not 1 <= mask_bits <= 20:
        raise ValueError(f"mask_bits {mask_bits} not in [1, 20]")
    schema = (f"{id_col} long, chunk_idx int, chunk_start int, "
              "chunk_len int, chunk_hash string")

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) == 0:
                    continue
                codes = np.frombuffer(
                    text.encode("utf-32-le"), np.uint32) % np.uint32(256)
                ends = _chunk_positions(codes, mask_bits)
                start = 0
                for ci, e in enumerate(ends):
                    piece = text[start:e + 1]
                    rows.append((int(did), ci, start + 1,
                                 len(piece),
                                 hashlib.md5(
                                     piece.encode()).hexdigest()))
                    start = e + 1
            yield pd.DataFrame(rows, columns=[
                id_col, "chunk_idx", "chunk_start", "chunk_len",
                "chunk_hash"])

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """chunk-level dedup ledger: per distinct chunk content, how many
    copies exist, across how many documents, and the bytes a
    content-addressed store saves by keeping one copy. One groupBy on
    the 16-byte hash (map-side partial agg); never keyed by content."""
    return (chunks.groupBy("chunk_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min("chunk_len").alias("chunk_len"),
                 ((F.count("*") - 1) * F.min("chunk_len"))
                 .alias("saved_chars")))
