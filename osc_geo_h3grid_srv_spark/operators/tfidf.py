"""Per-document top-k TF-IDF terms — the classic document keyword
profile (Salton & Buckley 1988, public formula; smooth idf variant
ln((N+1)/(df+1)) + 1 as popularized by scikit-learn's documentation).
Complements the corpus-level docfreq_idf entry and the BM25 retrieval
stack: same tokenizer (whitespace + lower, operators/retrieval.py:33),
but the output is per-DOC keywords, not a per-term index.

Plan shape at 100 TB:
* tf: one (doc, term) groupBy — partial aggregation collapses each
  partition's token stream before the exchange;
* df: a second groupBy over the (doc, term) relation — VOCABULARY x
  avg-doc-frequency sized, never the token stream;
* N: broadcast 1-row aggregate (no collect);
* the tf ⋈ df join is on term — vocabulary-keyed, Zipf-skewed, which
  AQE's skew-join splitting absorbs (common terms carry many (doc,
  term) rows but df itself is one row per term);
* top-k per doc: row_number window keyed by doc_id, deterministic
  tie-break (weight desc, term asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(docs: DataFrame, k: int, min_df: int = 1,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, rank, term, tf, df, tfidf round 6): each doc's k
    highest-weight terms among terms with document frequency
    >= min_df, weight = tf * (ln((N+1)/(df+1)) + 1)."""
    if k < 1:
        raise ValueError(f"k {k} must be >= 1")
    if min_df < 1:
        raise ValueError(f"min_df {min_df} must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"))
    df = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"))
    if min_df > 1:
        df = df.filter(F.col("df") >= F.lit(int(min_df)))
    n_row = docs.agg(F.count("*").cast("double").alias("__n"))
    w = (F.col("tf")
         * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0))
    weighted = (tf.join(df, "term")
                .crossJoin(F.broadcast(n_row))
                .withColumn("tfidf", w))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (weighted.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= F.lit(int(k)))
            .select("doc_id", F.col("rank").cast("int").alias("rank"),
                    "term", "tf", "df",
                    (F.round("tfidf", 6) + F.lit(0.0)).alias("tfidf")))
