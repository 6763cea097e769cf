"""URL canonicalization + domain analytics (operators/weburl.py)."""

from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.weburl import (
    domain_rollup, registrable_domain, url_table)


def _canon(spark, url):
    df = spark.createDataFrame([(1, url, 1)],
                               "doc_id long, url string, n_chars long")
    return url_table(df).select("canon_url", "host", "domain").first()


def test_canonical_case_port_fragment_tracking(spark):
    r = _canon(spark,
               "HTTPS://WWW.Site1.co.uk:443/a/b?utm_source=x&id=9&ref=tw#f")
    assert r["canon_url"] == "https://site1.co.uk/a/b?id=9"
    assert r["host"] == "site1.co.uk"
    assert r["domain"] == "site1.co.uk"   # PSL two-level suffix kept


def test_canonical_keeps_nondefault_port_sorts_params(spark):
    r = _canon(spark, "http://news.example.com:8080/path?z=1&a=2&fbclid=x")
    assert r["canon_url"] == "http://news.example.com:8080/path?a=2&z=1"
    assert r["domain"] == "example.com"


def test_canonical_bare_host_gets_root_path(spark):
    assert _canon(spark, "https://example.com")["canon_url"] == \
        "https://example.com/"


def test_registrable_domain_rules(spark):
    hosts = ["a.b.site.com", "site.com", "x.co.uk", "a.x.co.uk", "uk"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = dict(df.select("host", registrable_domain(F.col("host"))
                         .alias("d")).collect())
    assert got == {"a.b.site.com": "site.com", "site.com": "site.com",
                   "x.co.uk": "x.co.uk", "a.x.co.uk": "x.co.uk",
                   "uk": "uk"}


def test_blocklist_and_rollup(spark):
    rows = [(1, "https://a.site.com/x", 10),
            (2, "https://b.site.com/y", 20),
            (3, "https://bad.net/z", 30),
            (4, "https://site.com/w", 40)]
    df = spark.createDataFrame(rows,
                               "doc_id long, url string, n_chars long")
    u = url_table(df, blocked_domains=("bad.net",))
    assert [r["doc_id"] for r in
            u.filter("is_blocked").collect()] == [3]
    roll = {r["domain"]: (r["n_docs"], r["n_hosts"], r["total_weight"])
            for r in domain_rollup(u).collect()}
    assert roll == {"site.com": (3, 3, 70)}   # blocked row excluded


def test_url_table_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "https://a.com/x", 1)],
                               "doc_id long, url string, n_chars long")
    plan = url_table(df, blocked_domains=("b.com",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_extract_links_from_html_binary(spark):
    rows = [
        (1, "https://src.com/a",
         b'<html><body><a href="https://x.com/1"></a>'
         b'<a href="https://y.com/2?utm_source=t"></a></body></html>'),
        (2, "https://src.com/b", b"<html><body>no links</body></html>"),
        (3, "https://other.net/c",
         b'<p><a href="https://x.com/1"></a></p>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html binary")
    from osc_geo_h3grid_srv_spark.operators.weburl import (
        extract_links, link_domain_edges)
    got = sorted((r["src_url"], r["href"])
                 for r in extract_links(df).collect())
    assert got == [
        ("https://other.net/c", "https://x.com/1"),
        ("https://src.com/a", "https://x.com/1"),
        ("https://src.com/a", "https://y.com/2?utm_source=t"),
    ]
    edges = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_urls"])
             for r in link_domain_edges(df).collect()}
    assert edges == {("src.com", "x.com"): (1, 1),
                     ("src.com", "y.com"): (1, 1),
                     ("other.net", "x.com"): (1, 1)}


def test_extract_links_is_pythonless_single_projection(spark):
    df = spark.createDataFrame([(1, "https://a.com/x", b"<html></html>")],
                               "doc_id long, url string, html binary")
    from osc_geo_h3grid_srv_spark.operators.weburl import extract_links
    plan = extract_links(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_canonical_collapses_tracking_variants_in_edges(spark):
    # two hrefs to the same target differing only by utm params:
    # n_links counts both, n_urls collapses to one canonical target.
    rows = [(1, "https://src.com/a",
             b'<a href="https://x.com/p/9"></a>'
             b'<a href="https://x.com/p/9?utm_source=syn"></a>')]
    df = spark.createDataFrame(rows, "doc_id long, url string, html binary")
    from osc_geo_h3grid_srv_spark.operators.weburl import link_domain_edges
    r = link_domain_edges(df).collect()[0]
    assert (r["n_links"], r["n_urls"]) == (2, 1)


def test_inlink_profile_counts_and_distinct_hosts(spark):
    from osc_geo_h3grid_srv_spark.operators.weburl import inlink_profile
    pages = spark.createDataFrame([
        ("https://a.com/1",
         b'<a href="https://t.com/x"></a><a href="https://t.com/x?utm_source=z"></a>'),
        ("https://b.com/1", b'<a href="https://t.com/x"></a>'),
        ("https://a.com/2", b'<a href="https://u.com/y"></a>'),
        ("https://c.com/1", b'no links here'),
    ], "url string, html binary")
    got = {r["target"]: (r["n_inlinks"], r["n_src_hosts"])
           for r in inlink_profile(pages).collect()}
    # tracking variant collapses into the same target; a.com counted once
    assert got["https://t.com/x"] == (3, 2)
    assert got["https://u.com/y"] == (1, 1)
    assert len(got) == 2  # linkless page contributes nothing


def test_extract_anchors_alignment(spark):
    from osc_geo_h3grid_srv_spark.operators.weburl import extract_anchors
    pages = spark.createDataFrame([
        ("https://a.com/1",
         b'<a href="https://t.com/x">great site</a>'
         b'<p>noise</p><a href="https://u.com/y" rel="nofollow">other</a>'),
        ("https://b.com/1", b'<a href="https://t.com/x"></a>'),
        ("https://c.com/1", b'no links'),
    ], "url string, html binary")
    got = {(r["src_url"], r["href"]): r["anchor"]
           for r in extract_anchors(pages).collect()}
    # href and anchor arrays stay index-aligned across multiple links
    assert got[("https://a.com/1", "https://t.com/x")] == "great site"
    assert got[("https://a.com/1", "https://u.com/y")] == "other"
    assert got[("https://b.com/1", "https://t.com/x")] == ""
    assert len(got) == 3


def test_anchor_text_profile_topk(spark):
    from osc_geo_h3grid_srv_spark.operators.weburl import (
        anchor_text_profile)
    mk = '<a href="https://t.com/x{q}">{t}</a>'
    pages = spark.createDataFrame([
        ("https://a.com/1",
         (mk.format(q="", t="best spark guide")
          + mk.format(q="?utm_source=z", t="spark guide")).encode()),
        ("https://b.com/1", mk.format(q="", t="Spark tips").encode()),
        ("https://c.com/1", mk.format(q="", t="spark").encode()),
    ], "url string, html binary")
    rows = anchor_text_profile(pages, k=2).collect()
    got = {(r["target"], r["term"]):
           (r["n_mentions"], r["n_src_hosts"], r["rank"])
           for r in rows}
    # 'spark' mentioned 4x (case-folded, utm variant collapsed) from 3
    # hosts and ranks first; k=2 keeps only the top two terms
    assert got[("https://t.com/x", "spark")] == (4, 3, 1)
    assert got[("https://t.com/x", "guide")] == (2, 1, 2)
    assert len(rows) == 2
    assert ("https://t.com/x", "best") not in got
