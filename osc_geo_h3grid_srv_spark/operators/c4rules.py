"""C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning" §2.2 — public rules; the reference has no text
cleaning, this is the LLM-pipeline side of the brief):

line rules — a line is KEPT iff it
  * ends in a terminal punctuation mark (. ! ?),
  * has at least `min_words` whitespace words,
  * does not contain the word "javascript" (case-insensitive);
page rules — a page is DROPPED (clean_text NULL) iff it
  * contains "lorem ipsum" (case-insensitive),
  * contains a curly brace "{",
  * or keeps fewer than `min_lines` lines.

Everything is whole-stage-codegen column algebra: one projection
splits the page into a line array, one computes the kept sub-array
with a single higher-order filter (projected FIRST — higher-order
lambdas run interpreted with no common-subexpression elimination, so
the split must never be inlined into the lambda), and one assembles
flags + cleaned text. Zero shuffles, zero UDFs: the classic
embarrassingly-parallel corpus scan, so the 100 TB story is "as fast
as the parquet scan goes".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERMINAL = (".", "!", "?")


def _keep_line(x: Column, min_words: int) -> Column:
    return (F.right(x, F.lit(1)).isin(*_TERMINAL)
            & (F.size(F.split(F.trim(x), " +"))
               >= F.lit(int(min_words)))
            & ~F.lower(x).contains("javascript"))


def c4_clean(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", min_words: int = 3,
             min_lines: int = 5) -> DataFrame:
    """-> (doc_id, n_lines, n_kept, has_lorem, has_brace, page_ok,
    clean_text) — clean_text is the kept lines re-joined with \\n, or
    NULL when the page fails the page-level rules. Every input page
    surfaces exactly once (the caller filters on page_ok to curate)."""
    if min_words < 1:
        raise ValueError(f"min_words {min_words} must be >= 1")
    if min_lines < 1:
        raise ValueError(f"min_lines {min_lines} must be >= 1")
    lined = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.split(F.col(text_col), "\n").alias("__lines"))
    kept = lined.select(
        "doc_id", "__text", "__lines",
        F.filter("__lines",
                 lambda x: _keep_line(x, min_words)).alias("__kept"))
    low = F.lower(F.col("__text"))
    page_ok = (~low.contains("lorem ipsum")
               & ~F.col("__text").contains("{")
               & (F.size("__kept") >= F.lit(int(min_lines))))
    return kept.select(
        "doc_id",
        F.size("__lines").cast("long").alias("n_lines"),
        F.size("__kept").cast("long").alias("n_kept"),
        low.contains("lorem ipsum").alias("has_lorem"),
        F.col("__text").contains("{").alias("has_brace"),
        page_ok.alias("page_ok"),
        F.when(page_ok, F.array_join("__kept", "\n"))
        .alias("clean_text"))
