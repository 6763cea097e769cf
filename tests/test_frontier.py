"""Crawl-frontier politeness scheduling tests (operators/frontier.py)."""

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.frontier import (
    round_load, schedule_frontier)

URLS = [
    ("https://a.com/1", 5),
    ("https://a.com/2", 9),
    ("https://www.A.com/3", 1),   # same host as a.com after folding
    ("https://b.org/x", 7),
    ("https://b.org/y", 7),       # priority tie -> url order
    ("https://c.net/only", 2),
]


def _df(spark):
    return spark.createDataFrame(URLS, "url string, prio long")


def test_politeness_invariant_and_priority(spark):
    out = schedule_frontier(_df(spark), per_host=1,
                            priority_col="prio").collect()
    rows = {r["url"]: r for r in out}
    # no host twice in one round
    seen = {}
    for r in out:
        key = (r["host"], r["fetch_round"])
        assert key not in seen, key
        seen[key] = r["url"]
    # a.com: prio 9 first, then 5, then 1 (www-folded into same host)
    assert rows["https://a.com/2"]["fetch_round"] == 0
    assert rows["https://a.com/1"]["fetch_round"] == 1
    assert rows["https://www.A.com/3"]["fetch_round"] == 2
    # tie on b.org broken by url
    assert rows["https://b.org/x"]["fetch_round"] == 0
    assert rows["https://b.org/y"]["fetch_round"] == 1


def test_per_host_width_and_budget(spark):
    out = schedule_frontier(_df(spark), per_host=2, max_per_host=2,
                            priority_col="prio").collect()
    hosts = {}
    for r in out:
        hosts.setdefault(r["host"], []).append(r)
        assert r["fetch_round"] == 0  # 2 kept per host, width 2
    assert {h: len(v) for h, v in hosts.items()} == {
        "a.com": 2, "b.org": 2, "c.net": 1}
    # the budget dropped a.com's lowest-priority candidate
    kept = {r["url"] for r in out}
    assert "https://www.A.com/3" not in kept


def test_round_load_rollup(spark):
    sched = schedule_frontier(_df(spark), per_host=1,
                              priority_col="prio")
    got = {r["fetch_round"]: (r["n_urls"], r["n_hosts"])
           for r in round_load(sched).collect()}
    assert got == {0: (3, 3), 1: (2, 2), 2: (1, 1)}


def test_determinism_and_validation(spark):
    a = sorted(map(tuple, schedule_frontier(
        _df(spark), per_host=1, priority_col="prio").collect()))
    b = sorted(map(tuple, schedule_frontier(
        _df(spark), per_host=1, priority_col="prio").collect()))
    assert a == b
    with pytest.raises(ValueError):
        schedule_frontier(_df(spark), per_host=0)
    with pytest.raises(ValueError):
        schedule_frontier(_df(spark), per_host=1, max_per_host=-1)


def test_lexicographic_without_priority(spark):
    out = schedule_frontier(_df(spark), per_host=1)
    rows = {r["url"]: r["fetch_round"] for r in out.collect()}
    assert rows["https://a.com/1"] == 0
    assert rows["https://a.com/2"] == 1


def test_crawl_delays_parse_and_timeline(spark):
    from osc_geo_h3grid_srv_spark.operators.frontier import (
        schedule_with_delays)
    from osc_geo_h3grid_srv_spark.operators.robots import crawl_delays
    robots = spark.createDataFrame([
        # starred group delay 2.5; named group 99 ignored
        ("a.com", "User-agent: fast\nCrawl-delay: 99\n\n"
                  "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"),
        # two starred declarations -> max wins
        ("b.org", "User-agent: *\nCrawl-delay: 1\n\n"
                  "User-agent: *\nCrawl-delay: 3\n"),
        # non-numeric ignored -> host absent from the table
        ("c.net", "User-agent: *\nCrawl-delay: soon\n"),
    ], "host string, body string")
    d = {r["host"]: r["delay_s"] for r in crawl_delays(robots).collect()}
    assert d == {"a.com": 2.5, "b.org": 3.0}

    urls = spark.createDataFrame(
        [(f"https://a.com/{i}", i) for i in range(3)]
        + [("https://c.net/1", 9), ("https://c.net/2", 8)],
        "url string, prio long")
    t = {(r["host"], r["fetch_round"]): (r["delay_s"], r["fetch_at_s"])
         for r in schedule_with_delays(
             urls, crawl_delays(robots), per_host=1,
             default_delay_s=1.5, priority_col="prio").collect()}
    assert t[("a.com", 2)] == (2.5, 5.0)   # declared delay scales rounds
    assert t[("c.net", 1)] == (1.5, 1.5)   # fallback default


def test_timeline_spacing_with_per_host_gt1(spark):
    # Crawl-delay compliance is between CONSECUTIVE same-host requests:
    # with per_host=2 the two fetches of one round must still be
    # delay_s apart, i.e. fetch_at_s == (host_rank-1)*delay_s
    # (ADVICE r3: they used to share one timestamp per round).
    from osc_geo_h3grid_srv_spark.operators.frontier import (
        schedule_with_delays)
    from osc_geo_h3grid_srv_spark.operators.robots import crawl_delays
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, body string")
    urls = spark.createDataFrame(
        [(f"https://a.com/{i}", i) for i in range(5)],
        "url string, prio long")
    rows = schedule_with_delays(urls, crawl_delays(robots),
                                per_host=2, priority_col="prio") \
        .orderBy("host_rank").collect()
    got = [(r["host_rank"], r["fetch_round"], r["fetch_at_s"])
           for r in rows]
    assert got == [(1, 0, 0.0), (2, 0, 2.0), (3, 1, 4.0),
                   (4, 1, 6.0), (5, 2, 8.0)]
    ats = [r["fetch_at_s"] for r in rows]
    assert all(b - a == 2.0 for a, b in zip(ats, ats[1:]))
