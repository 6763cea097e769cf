"""Sitemap source (sources/sitemap.py): round-trip, index files,
namespace handling, quarantine, distributed parse accounting."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.sources.sitemap import (
    SitemapParseError, encode_sitemap, parse_sitemap, sitemap_urls)


def test_roundtrip_urlset():
    entries = [
        {"loc": "https://a.example/p/1", "lastmod": "2024-02-03",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "https://a.example/p/2"},
        {"loc": "https://b.example/?q=x&y=1"},  # needs escaping
    ]
    is_index, rows = parse_sitemap(encode_sitemap(entries))
    assert not is_index
    assert [r["loc"] for r in rows] == [e["loc"] for e in entries]
    assert rows[0]["lastmod"] == "2024-02-03"
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] is None and rows[1]["priority"] is None


def test_roundtrip_sitemapindex():
    entries = [{"loc": "https://a.example/sitemap1.xml",
                "lastmod": "2024-01-01"},
               {"loc": "https://a.example/sitemap2.xml"}]
    is_index, rows = parse_sitemap(encode_sitemap(entries, index=True))
    assert is_index
    assert len(rows) == 2


def test_namespace_agnostic_and_unknown_children():
    # real-world sitemaps: missing namespace, extra elements — both
    # must parse (local-name matching, unknown children skipped)
    raw = (b'<?xml version="1.0"?><urlset>'
           b'<url><loc>https://x.example/a</loc>'
           b'<mobile:mobile xmlns:mobile="http://m"/></url>'
           b'<extra/></urlset>')
    is_index, rows = parse_sitemap(raw)
    assert not is_index and len(rows) == 1
    assert rows[0]["loc"] == "https://x.example/a"


def test_malformed_quarantine():
    cases = [
        b"not xml at all",
        b"<?xml version='1.0'?><rss><channel/></rss>",  # wrong root
        b"<urlset><url></url></urlset>",  # url without loc
        b"<urlset><url><loc>https://x/</loc>"
        b"<changefreq>fortnightly</changefreq></url></urlset>",
        b"<urlset><url><loc>https://x/</loc>"
        b"<priority>high</priority></url></urlset>",
        encode_sitemap([{"loc": "https://x/"}])[:30],  # truncation
    ]
    for buf in cases:
        with pytest.raises(SitemapParseError):
            parse_sitemap(buf)


def test_mutation_fuzz():
    good = encode_sitemap([
        {"loc": f"https://s.example/p/{i}", "priority": "0.5"}
        for i in range(8)])
    rs = np.random.RandomState(13)
    for _ in range(300):
        pos = int(rs.randint(0, len(good)))
        bad = (good[:pos] + bytes([int(rs.randint(0, 256))])
               + good[pos + 1:])
        try:
            parse_sitemap(bad)
        except SitemapParseError:
            pass


def test_spark_sitemap_urls_accounting(spark):
    import pandas as pd
    ok1 = encode_sitemap([{"loc": "https://a.example/1",
                           "changefreq": "weekly"},
                          {"loc": "https://a.example/2"}])
    idx = encode_sitemap([{"loc": "https://a.example/child.xml"}],
                         index=True)
    bad = b"<urlset><url><loc></loc></url></urlset>"
    df = spark.createDataFrame(pd.DataFrame(
        [(1, ok1), (2, idx), (3, bad)],
        columns=["sitemap_id", "payload"]))
    out = sitemap_urls(df).toPandas()
    # every input sitemap is accounted for
    assert set(out.sitemap_id) == {1, 2, 3}
    assert len(out[out.sitemap_id == 1]) == 2
    assert not out[out.sitemap_id == 1].is_index.any()
    child = out[out.sitemap_id == 2]
    assert len(child) == 1 and child.is_index.all()
    q = out[out.sitemap_id == 3]
    assert len(q) == 1
    assert q["error"].notna().all()
    assert q["loc"].isna().all()
