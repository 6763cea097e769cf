"""Event-sequence analytics over the events stream: ordered funnel
conversion and weekly cohort retention — the two standard behavioral
rollups of any web-scale event pipeline (textbook web-analytics
semantics; no reference counterpart — the reference has no event
sequencing).

* funnel: a user converts step k iff they performed step k's event
  STRICTLY AFTER their step-(k-1) conversion time; conversion time is
  the EARLIEST such event (the standard strict-order, first-touch
  funnel). Computed as a chain of per-user min-aggregates with a
  time-shifted equi-join per step — each step is one user-keyed
  shuffle of that step's events only, never a per-user sort of the
  full stream, and the user-keyed exchanges co-locate so AQE reuses
  the partitioning across steps.
* cohort retention: cohort = ISO week of the user's first event
  (any type); a cohort is "active at age a" if the user has any event
  in cohort_week + a weeks. One distinct over (user, week) — corpus
  collapses to user-week grain before the join with first-weeks.

Both are pure relational plans; the entries value-hash-gate them
against identical DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(events: DataFrame, steps: list[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """-> (step, event_type, n_users, pct_of_step1 round 4) for the
    strict-order first-touch funnel over `steps`."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate steps: {steps}")
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(F.col(user_col).alias("u"))
           .agg(F.min(ts_col).alias("t")))
    reached = [cur]
    for s in steps[1:]:
        nxt = (events.filter(F.col(type_col) == s)
               .select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("ts2"))
               .join(cur, "u")
               .filter(F.col("ts2") > F.col("t"))
               .groupBy("u").agg(F.min("ts2").alias("t")))
        reached.append(nxt)
        cur = nxt
    counts = None
    for i, (s, df) in enumerate(zip(steps, reached), start=1):
        c = df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(s).alias("event_type"),
            "n_users")
        counts = c if counts is None else counts.unionByName(c)
    base = (reached[0].agg(F.count("*").cast("double").alias("n1")))
    return (counts.crossJoin(F.broadcast(base))
            .select("step", "event_type", "n_users",
                    F.round(F.col("n_users").cast("double")
                            / F.col("n1"), 4).alias("pct_of_step1")))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """-> (cohort_week 'yyyy-MM-dd', age_weeks, n_active) weekly
    retention triangle; age 0 row equals cohort size."""
    uw = (events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).alias("w"))
        .distinct())
    first = uw.groupBy("u").agg(F.min("w").alias("cw"))
    return (uw.join(first, "u")
            .select("u", F.date_format("cw", "yyyy-MM-dd")
                    .alias("cohort_week"),
                    (F.datediff(F.col("w"), F.col("cw")) / 7)
                    .cast("long").alias("age_weeks"))
            .groupBy("cohort_week", "age_weeks")
            .agg(F.count_distinct("u").cast("long").alias("n_active")))


def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts", seq_col: str = "event_id",
                       type_col: str = "event_type") -> DataFrame:
    """-> (prev_type, next_type, n, p round 6): first-order Markov
    transition matrix of the per-user event sequence — for every
    consecutive event pair in (ts, seq) order, count (prev, next) and
    normalize per prev row. The behavioral-model companion of the
    funnel: the funnel answers "did the user follow THIS path", the
    transition matrix answers "which paths exist".

    One user-keyed window (lag) + one |types|²-sized groupBy; the per-
    prev normalizer is a window over the tiny transition relation, not
    the stream. Counts are integer-exact; p is one division, so the
    DuckDB replay hashes identically."""
    w = Window.partitionBy(user_col).orderBy(ts_col, seq_col)
    pairs = (events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"))
        .filter(F.col("prev_type").isNotNull()))
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("long").alias("n"))
    wprev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n") / F.sum("n").over(wprev), 6).alias("p"))


def session_paths(events: DataFrame, top_k: int = 20,
                  max_steps: int = 8, user_col: str = "user_id",
                  ts_col: str = "ts", seq_col: str = "event_id",
                  type_col: str = "event_type",
                  day_col: str | None = None) -> DataFrame:
    """-> (rank, path, n): the top_k most common event-type paths,
    where a path is the first max_steps event types of one (user,
    utc day) session joined with '>' in (ts, seq) order. The classic
    "what do users actually do" rollup between the funnel (one fixed
    path) and the transition matrix (one step).

    One (user, day) groupBy builds the ordered type list via
    sort_array over (ts, seq, type) structs — deterministic, no
    window over the raw stream — then a path-keyed count and a
    TakeOrderedAndProject top-k (ties break on path asc)."""
    if top_k < 1:
        raise ValueError(f"top_k {top_k} must be >= 1")
    if max_steps < 1:
        raise ValueError(f"max_steps {max_steps} must be >= 1")
    day = (F.col(day_col) if day_col
           else F.date_trunc("day", F.col(ts_col).cast("timestamp")))
    g = (events.groupBy(F.col(user_col).alias("u"), day.alias("d"))
         .agg(F.sort_array(F.collect_list(F.struct(
             F.col(ts_col).alias("t"), F.col(seq_col).alias("q"),
             F.col(type_col).alias("y")))).alias("evs")))
    path = F.array_join(
        F.slice(F.transform("evs", lambda s: s.y), 1, int(max_steps)),
        ">")
    counts = (g.select(path.alias("path"))
              .groupBy("path").agg(F.count("*").cast("long").alias("n")))
    w = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (counts.orderBy(F.col("n").desc(), F.col("path").asc())
            .limit(int(top_k))
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "path", "n"))
