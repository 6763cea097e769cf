"""Crawl-frontier scheduling with per-host politeness — the batch that
sits between link extraction and the fetcher in a Common-Crawl-style
pipeline: given candidate URLs with priorities, emit (url, fetch_round)
such that no host appears more than `per_host` times in any round and
higher-priority URLs fetch earlier. With one fetch wave per round and a
fixed crawl-delay per host, round number IS the politeness schedule
(public design: Mercator frontier front/back queues, Heydon & Najork
1999 — the back-queue rotation is exactly a per-host round index).

Scale shape: ONE shuffle, keyed by host (the window partition). The
rank within a host is a row_number ordered by (priority desc, url); the
round is (rank-1) div per_host. Hosts are independent -> embarrassingly
parallel; a mega-host (crawler-trap shaped skew) bounds only its own
partition, and `max_per_host` truncates such hosts at plan level —
the filter sits on the SAME windowed expression, no second pass.
Optionally a `budget` caps the rounds kept (rounds are dense per host,
so round < ceil(budget/per_host) keeps at most `budget` urls per host).

No state, no driver loop: re-running on the same frontier reproduces
the identical schedule (ties broken by url), which is what a resumable
fetcher needs to claim work idempotently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.weburl import host_from_url


def schedule_frontier(urls: DataFrame, per_host: int = 1,
                      max_per_host: int | None = None,
                      url_col: str = "url",
                      priority_col: str | None = None) -> DataFrame:
    """(url, host, host_rank, fetch_round) for every kept candidate.

    per_host: max fetches of one host inside a single round.
    max_per_host: drop a host's candidates beyond this rank (crawl
    budget / trap bound); None keeps all.
    priority_col: higher fetches earlier; None = url-lexicographic."""
    if per_host <= 0:
        raise ValueError(f"per_host must be positive, got {per_host}")
    if max_per_host is not None and max_per_host <= 0:
        raise ValueError(
            f"max_per_host must be positive, got {max_per_host}")
    host = host_from_url(F.col(url_col))
    df = urls.withColumn("host", host)
    order = ([F.col(priority_col).desc()] if priority_col else []) \
        + [F.col(url_col).asc()]
    w = Window.partitionBy("host").orderBy(*order)
    df = df.withColumn("host_rank",
                       F.row_number().over(w).cast("long"))
    if max_per_host is not None:
        df = df.filter(F.col("host_rank") <= max_per_host)
    return df.withColumn(
        "fetch_round",
        ((F.col("host_rank") - 1) / F.lit(per_host))
        .cast("long"))


def round_load(schedule: DataFrame) -> DataFrame:
    """per-round fetch load: (fetch_round, n_urls, n_hosts) — the
    capacity-planning rollup a fetcher sizes its wave pool from."""
    return (schedule.groupBy("fetch_round")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.countDistinct("host").cast("long").alias("n_hosts")))


def schedule_with_delays(urls: DataFrame, delays: DataFrame,
                         per_host: int = 1,
                         default_delay_s: float = 1.0,
                         max_per_host: int | None = None,
                         url_col: str = "url",
                         priority_col: str | None = None) -> DataFrame:
    """politeness schedule as a concrete TIMELINE: the round schedule
    joined with per-host crawl delays (robots.crawl_delays output;
    hosts without a declared delay get default_delay_s), giving
    fetch_at_s = (host_rank - 1) * delay_s — the earliest offset a
    compliant fetcher may issue the request. Crawl-delay requires
    delay_s spacing between CONSECUTIVE requests to one host, so the
    spacing is per host_rank, not per round: with per_host > 1 the
    requests of one round are still delay_s apart (round membership
    remains the wave/queue grouping, not the clock). The delays table
    is host-keyed and tiny relative to the frontier -> broadcast; the
    frontier is never reshuffled for it."""
    from pyspark.sql import functions as F
    sched = schedule_frontier(urls, per_host=per_host,
                              max_per_host=max_per_host,
                              url_col=url_col,
                              priority_col=priority_col)
    d = F.broadcast(delays.select("host", "delay_s"))
    return (sched.join(d, "host", "left")
            .withColumn("delay_s",
                        F.coalesce("delay_s",
                                   F.lit(float(default_delay_s))))
            .withColumn("fetch_at_s",
                        (F.col("host_rank") - 1) * F.col("delay_s")))
