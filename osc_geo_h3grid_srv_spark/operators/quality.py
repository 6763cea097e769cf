"""Model-based quality filtering (linear classifier scoring pass).

Web-corpus pipelines follow the heuristic quality ratios with a learned
quality MODEL (fasttext-style linear classifier over cheap text
features is the public standard shape). Training happens offline; the
engine's job is the 100 TB SCORING pass, and that must be a pure
map-side expression: no shuffle, no Python, weights folded into the
plan as literals (a real fasttext bigram model would broadcast its
embedding table instead — same plan shape, bigger constant).

Every feature here is a whole-stage-codegen JVM expression over the
token array (split / filter / array_distinct / regexp_replace), the
score is a literal-weight dot product through a sigmoid, and the whole
operator is replayable verbatim in DuckDB (list_filter /
list_distinct / regexp_replace + exp), which is how the driver oracle
checks it.

The weights are fixed public-heuristic-inspired constants (more
tokens, higher lexical diversity, more stopwords => higher quality;
digit- and punctuation-heavy text => lower), NOT a trained artifact —
the operator's contract is deterministic scoring, not model quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (feature, weight) — applied to doc features in the fixed order below.
QUALITY_WEIGHTS = {
    "log_tokens": 0.9,
    "type_token_ratio": 2.0,
    "stopword_ratio": 3.0,
    "digit_ratio": -6.0,
    "punct_ratio": -4.0,
}
QUALITY_BIAS = -3.5

# small fixed english stopword list (public, frequency-list standard)
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it",
             "for", "on", "with", "as", "at", "by", "that", "this")


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """per-doc scalar features, all map-side JVM expressions."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n_tok = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(lower({text_col}), ' '), "
        f"t -> t in ({stop_list})))")
    n_chars = F.length(text_col)
    n_digit = F.length(F.regexp_replace(text_col, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text_col, "[^.,;:!?]", ""))
    nz = F.greatest(n_chars, F.lit(1))
    return docs.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(F.log(n_tok + F.lit(1.0)), 6).alias("log_tokens"),
        F.round(F.size(F.array_distinct(toks))
                / F.greatest(n_tok, F.lit(1)), 6).alias("type_token_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
        .alias("stopword_ratio"),
        F.round(n_digit / nz, 6).alias("digit_ratio"),
        F.round(n_punct / nz, 6).alias("punct_ratio"))


def quality_classifier(docs: DataFrame, threshold: float = 0.5,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """score = sigmoid(w . features + b) on the ROUNDED features (so an
    engine replay sees identical inputs); `keep` = score >= threshold.
    One projection, zero shuffles, zero Python."""
    feats = quality_features(docs, id_col=id_col, text_col=text_col)
    z = F.lit(QUALITY_BIAS)
    for name, w in QUALITY_WEIGHTS.items():
        z = z + F.col(name) * F.lit(w)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (feats
            .withColumn("quality_score", score)
            .withColumn("keep",
                        (F.col("quality_score") >= F.lit(threshold))
                        .cast("int")))


def top_fraction_by_group(df: DataFrame, frac: float, group_col: str,
                          score_col: str, id_col: str = "doc_id"
                          ) -> DataFrame:
    """Curation selection: keep the best `frac` fraction of rows per
    group by score (ties broken by lowest id — fully deterministic, so
    re-runs and engine replays select the SAME rows). keep count =
    ceil(frac * group size), so every non-empty group keeps >= 1 row.

    Both windows (rank + group count) partition on `group_col`, so
    Catalyst computes them over ONE exchange + sort. This exact-rank
    form is for reproducible selection at moderate group cardinality;
    at 10^12 rows per group the same semantics (up to ties) come from
    an approx_percentile(score, 1-frac) threshold broadcast back as a
    filter — one aggregate + one map pass, no global sort. Prefer
    `frac` values with exact binary representations (0.25, 0.5) so the
    ceil(frac * n) boundary cannot differ between engines."""
    from pyspark.sql import Window
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac {frac} not in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc())
    wn = Window.partitionBy(group_col)
    return (df.withColumn("__rk", F.row_number().over(w))
            .withColumn("__n", F.count("*").over(wn))
            .filter(F.col("__rk")
                    <= F.ceil(F.lit(float(frac)) * F.col("__n")))
            .drop("__rk", "__n"))


def top_fraction_by_group_approx(df: DataFrame, frac: float,
                                 group_col: str, score_col: str,
                                 accuracy: int = 10000) -> DataFrame:
    """The 10^12-rows-per-group scale path promised by
    top_fraction_by_group's docstring: instead of an exact per-group
    rank (which needs a full sort of every group), compute a per-group
    score threshold with percentile_approx(score, 1 - frac) — a
    Greenwald-Khanna sketch, mergeable and map-side partial, so the
    aggregate never materializes a group in one task — broadcast the
    (group, threshold) table back, and keep rows with
    score >= threshold as a pure map filter.

    Plan shape: ONE partial+final aggregate over a group-keyed
    exchange of sketch objects + ONE BroadcastHashJoin + codegen
    filter. No Window, no rangepartitioning/global sort anywhere.

    Semantics vs exact: the kept fraction per group is frac within the
    sketch rank error eps ~= 1/accuracy (plus ties at the threshold,
    which are ALL kept — >= keeps the selection deterministic and a
    superset under ties). Every non-empty group keeps >= 1 row: the
    group max always clears its own percentile. frac=1.0 degenerates
    to the group min -> keeps everything, matching the exact form."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac {frac} not in (0, 1]")
    if accuracy < 1:
        raise ValueError(f"accuracy {accuracy} must be >= 1")
    thr = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, float(1.0 - frac),
                            int(accuracy)).alias("__thr"))
    return (df.join(F.broadcast(thr), group_col)
            .filter(F.col(score_col) >= F.col("__thr"))
            .drop("__thr"))


# Gopher quality-rule thresholds (Rae et al. 2112.11446 Table A1,
# public literature). The "stop words" list is the paper's own.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_quality_flags(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_words: int = 50,
                         max_words: int = 100_000,
                         min_mean_len: float = 3.0,
                         max_mean_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         min_alpha_frac: float = 0.8,
                         min_stop_hits: int = 2) -> DataFrame:
    """the published Gopher rule filter (Rae et al., the public
    heuristic-gate standard that MassiveWeb and its descendants apply
    BEFORE any learned quality model): per document, the measured
    signals and one boolean per rule plus the overall gate —

      * word count within [min_words, max_words]
      * mean word length within [min_mean_len, max_mean_len]
      * '#'/ellipsis symbol-to-word ratio <= max_symbol_ratio
      * fraction of words containing an alphabetic char >= min_alpha_frac
      * at least min_stop_hits DISTINCT Gopher stop words present

    Everything is ONE shuffle-free whole-stage-codegen projection over
    the token array (split / size / aggregate / filter / rlike) — the
    10^12-row gate is a map-only scan, exactly like quality_features.
    Ratios are rounded to 6 digits BEFORE the threshold compare so the
    DuckDB oracle replay and any re-run flip the same documents.

    Returned flags: (doc_id, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, n_stop_hits, pass_word_count, pass_mean_len,
    pass_symbol, pass_alpha, pass_stopwords, gopher_pass)."""
    t = text_col
    toks = F.split(F.col(t), " ")
    n_words = F.size(toks).cast("bigint")
    nzw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.round(
        F.expr(f"aggregate(split({t}, ' '), cast(0 as bigint), "
               "(acc, x) -> acc + length(x))") / nzw, 6)
    n_sym = (F.length(t)
             - F.length(F.regexp_replace(t, r"[#…]", ""))
             ).cast("bigint")
    sym_ratio = F.round(n_sym / nzw, 6)
    n_alpha = F.expr(f"size(filter(split({t}, ' '), "
                     "x -> x rlike '[a-zA-Z]'))").cast("bigint")
    alpha_frac = F.round(n_alpha / nzw, 6)
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_stop = F.expr(
        f"size(filter(array({stop_list}), "
        f"s -> array_contains(split(lower({t}), ' '), s)))"
    ).cast("bigint")
    out = docs.select(
        F.col(id_col), n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stop_hits"))
    p_wc = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words))
    p_ml = ((F.col("mean_word_len") >= min_mean_len)
            & (F.col("mean_word_len") <= max_mean_len))
    p_sy = F.col("symbol_ratio") <= max_symbol_ratio
    p_al = F.col("alpha_word_frac") >= min_alpha_frac
    p_st = F.col("n_stop_hits") >= min_stop_hits
    return (out.withColumn("pass_word_count", p_wc)
            .withColumn("pass_mean_len", p_ml)
            .withColumn("pass_symbol", p_sy)
            .withColumn("pass_alpha", p_al)
            .withColumn("pass_stopwords", p_st)
            .withColumn("gopher_pass",
                        p_wc & p_ml & p_sy & p_al & p_st))
