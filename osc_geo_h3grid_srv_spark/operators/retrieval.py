"""Ranked retrieval over the document corpus: BM25 scoring — the
standard web-text relevance function (Robertson/Sparck Jones, public
literature) and the usual first ranking stage of a crawl-indexing
pipeline.

score(d, Q) = sum over q in Q of
    ln(1 + (N - df_q + 0.5)/(df_q + 0.5))
    * tf_qd * (k1 + 1) / (tf_qd + k1 * (1 - b + b * dl_d / avgdl))

Scale design (one narrow shuffle chain, no driver-side loops):
* terms are filtered to the query vocabulary BEFORE the tf aggregate,
  so the shuffle carries only (doc, query-term) hits — at 10^11 docs
  the width is bounded by |Q| x matching docs, not the corpus token
  count;
* df comes from the same filtered set (group on the term — |Q| groups)
  and joins back by broadcast;
* corpus stats (N, avgdl) are a single-row aggregate broadcast-crossed
  into the plan — no collect(), the scalars ride the plan;
* top-k is orderBy+limit -> TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"
              ) -> DataFrame:
    """-> (id_col, score round 6, n_matched), ties broken by id."""
    words = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), words.alias("ws"),
                       F.size(words).cast("double").alias("dl"))
    stats = base.agg(F.count("*").cast("double").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    # prune to query-vocab tokens INSIDE the array (codegen lambda)
    # before the generate: explode then emits |matching tokens| rows,
    # not |all tokens| — at web scale the generate's row volume drops
    # from the corpus token count to |Q| x matching docs, and docs with
    # no hit never produce a row at all.
    qvocab = F.array(*[F.lit(t) for t in query_terms])
    hits = (base.select(
                id_col, "dl",
                F.filter("ws", lambda w: F.array_contains(qvocab, w))
                 .alias("qs"))
            .filter(F.size("qs") > 0)
            .select(id_col, "dl", F.explode("qs").alias("w"))
            .groupBy(id_col, "dl", "w")
            .agg(F.count("*").cast("double").alias("tf")))
    dfreq = (hits.groupBy("w")
             .agg(F.count_distinct(F.col(id_col)).cast("double")
                  .alias("df")))
    j = (hits.join(F.broadcast(dfreq), "w")
         .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + F.lit(k1)
             * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (j.groupBy(id_col)
            .agg(F.round(F.sum(contrib), 6).alias("score"),
                 F.count("*").cast("long").alias("n_matched"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))


def build_postings(docs: DataFrame, min_df: int = 1,
                   encode: str = "gaps",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted-index construction: per term, the document frequency,
    total term frequency, and the posting list serialized as a string
    — `doc:tf` pairs in doc-id order, with `encode="gaps"` storing
    DELTA-ENCODED doc ids (first id absolute, then successive gaps):
    the standard index compression that keeps posting bytes
    proportional to ln(gap) instead of ln(maxdoc) once a varint codec
    is layered on (public design: Witten/Moffat/Bell, "Managing
    Gigabytes"; every web index works this way).

    One shuffle to (term, doc) tf counts, one to the per-term rollup.
    The gap transform runs AFTER sort_array inside the aggregate
    projection — JVM higher-order functions, no window, no Python.
    min_df prunes the hapax tail (the classic index-size lever; at
    10^12 docs the tail dominates vocabulary, not postings mass).

    Returns (term, df, total_tf, postings string)."""
    if encode not in ("gaps", "ids"):
        raise ValueError(f"encode must be 'gaps' or 'ids', got {encode!r}")
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
    tok = tok.filter(F.col("term") != "")
    tf = tok.groupBy("term", "doc").agg(
        F.count("*").cast("long").alias("tf"))
    agg = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.sort_array(F.collect_list(F.struct("doc", "tf")))
        .alias("plist"))
    if min_df > 1:
        agg = agg.filter(F.col("df") >= min_df)
    if encode == "gaps":
        # element i stores doc_i - doc_{i-1} (doc_0 absolute)
        enc = F.zip_with(
            "plist",
            F.concat(F.array(F.struct(
                F.lit(0).cast("long").alias("doc"),
                F.lit(0).cast("long").alias("tf"))),
                F.slice("plist", 1, F.size("plist") - 1)),
            lambda cur, prev: F.concat_ws(
                ":", cur["doc"] - prev["doc"], cur["tf"]))
    else:
        enc = F.transform(
            "plist", lambda x: F.concat_ws(":", x["doc"], x["tf"]))
    return agg.select(
        "term", "df", "total_tf",
        F.array_join(enc, ",").alias("postings"))


def phrase_search(docs: DataFrame, phrase: list[str],
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact phrase search via positional postings alignment — the
    positional-index query every web search stack runs after the
    boolean stage (public design: positional inverted files,
    Witten/Moffat/Bell ch. 4; here the positions come straight off the
    tokenizer, i.e. the logical plan a positional index materializes).

    A phrase occurrence of m terms starting at position s means term i
    sits at position s+i for every i in [0, m). Each token row that
    matches term i votes for start s = pos - i; a start with all m
    distinct votes is a hit. Scale shape:

    * the vocab filter (term IN phrase) lands BEFORE any shuffle, so
      the aggregate input is only the phrase-term hits, not the corpus
      token stream;
    * a token row fans out once per offset at which its term occurs in
      the phrase (repeated phrase terms -> several votes) via a
      broadcast join against the m-row offsets table;
    * one groupBy(doc, start) then one groupBy(doc) — both narrow,
      map-side combined. No window, no Python, no self-join per term
      (the classic k-way postings intersection becomes ONE aggregate).

    Returns (id, n_hits, first_pos) per matching doc; positions are
    0-based token offsets."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    m = len(phrase)
    terms = [t.lower() for t in phrase]
    spark = docs.sparkSession
    offs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "i long, term string")
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " "))
        .alias("pos", "term"))
        .filter(F.col("term").isin(terms)))
    votes = (toks.join(F.broadcast(offs), "term")
             .select(id_col, (F.col("pos") - F.col("i")).alias("start"),
                     "i")
             .filter(F.col("start") >= 0))
    # (doc, start, i) is unique per token row (pos = start + i), so
    # count(*) == m  <=>  every offset matched
    starts = (votes.groupBy(id_col, "start")
              .agg(F.count("*").alias("nv"))
              .filter(F.col("nv") == m))
    return (starts.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_hits"),
                 F.min("start").cast("long").alias("first_pos")))


def rrf_fuse(rankings: list[DataFrame], k0: int = 60, k: int = 25,
             id_col: str = "doc_id", score_col: str = "score"
             ) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked lists — the standard way to combine a lexical (BM25)
    and a dense (embedding-cosine) retriever into one hybrid ranking
    without score calibration:

        rrf(d) = sum over systems s ranking d of  1 / (k0 + rank_s(d))

    Each input is an (id_col, score_col) DataFrame (any extra columns
    are dropped). Ranks are row_number over (score desc, id asc) —
    fully deterministic, and computed on the already-ROUNDED scores the
    retrievers emit so the oracle's ranking replays bit-identically.

    Returns (id_col, rrf_score round 6, n_systems) top-k ordered by
    (rrf_score desc, id asc).

    Scale: the inputs are top-n system outputs (bounded — thousands of
    rows, not the corpus), so each rank window is a single tiny
    partition and the fuse is one union + one groupBy; at 10^12-doc
    corpora the heavy lifting stays inside the retrievers, which
    already avoid global sorts (TakeOrderedAndProject).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k0 < 1:
        raise ValueError(f"k0 {k0} must be >= 1")
    from pyspark.sql import Window
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    tagged = None
    for df in rankings:
        r = (df.select(id_col, score_col)
             .withColumn("rank", F.row_number().over(w))
             .select(id_col, (1.0 / (F.lit(float(k0)) + F.col("rank")))
                     .alias("rr")))
        tagged = r if tagged is None else tagged.unionByName(r)
    return (tagged.groupBy(id_col)
            .agg(F.round(F.sum("rr"), 6).alias("rrf_score"),
                 F.count("*").cast("long").alias("n_systems"))
            .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
            .limit(k))
