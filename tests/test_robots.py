"""robots.txt exclusion (operators/robots.py): RFC 9309 parsing
(user-agent groups, consecutive-UA runs, named-agent exclusion) and
precedence (longest match wins, Allow wins ties, default allow)."""

from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.robots import (
    robots_filter, rules_from_robots_txt)

BODY_A = """User-agent: googlebot
Disallow: /only-for-google

User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp

User-agent: other
Allow: /
"""

# consecutive UA lines: one group addressed to both; starred -> kept
BODY_B = """User-agent: somebot
User-agent: *
Disallow: /b/
"""

# no starred group at all -> no rules -> everything allowed
BODY_C = """User-agent: onlybot
Disallow: /
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", BODY_A), ("b.com", BODY_B), ("c.com", BODY_C)],
        "host string, body string")
    return rules_from_robots_txt(df)


def test_parse_groups_and_directives(spark):
    got = sorted((r["host"], r["directive"], r["prefix"])
                 for r in _rules(spark).collect())
    assert got == [
        ("a.com", "allow", "/private/ok"),
        ("a.com", "disallow", "/private/"),
        ("a.com", "disallow", "/tmp"),
        ("b.com", "disallow", "/b/"),
    ]


def test_filter_precedence(spark):
    urls = [
        ("https://a.com/free", True),          # no matching rule
        ("https://a.com/private/x", False),    # disallow /private/
        ("https://a.com/private/ok/y", True),  # longer allow wins
        ("https://a.com/tmpfile", False),      # prefix match, no slash
        ("https://a.com/only-for-google", True),  # named group ignored
        ("https://b.com/b/1", False),          # consecutive-UA group
        ("https://b.com/a/1", True),
        ("https://c.com/anything", True),      # no starred group
        ("https://www.A.com/private/z", False),  # host folding
        ("https://nobody.net/x", True),        # host without robots
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {r["url"]: r["is_allowed"]
           for r in robots_filter(df, _rules(spark)).collect()}
    for u, want in urls:
        assert got[u] is want, (u, want, got[u])


def test_filter_keeps_all_rows_and_columns(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/private/x"), (2, "https://a.com/ok")],
        "id long, url string")
    out = robots_filter(df, _rules(spark))
    assert sorted(out.columns) == ["id", "is_allowed", "url"]
    assert out.count() == 2


def test_filter_plan_broadcasts_rules(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")],
                               "id long, url string")
    plan = robots_filter(df, _rules(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan
