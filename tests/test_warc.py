"""WARC/1.0 container source (sources/warc.py): writer/parser
round-trip, byte-identical html + extracted text through the
distributed ingest, non-response skipping, malformed-record
quarantine."""

import os

import pandas as pd

from osc_geo_h3grid_srv_spark.sources.warc import (
    parse_warc_bytes, pages_from_warc, write_warc_bytes)


def _recs(n, start=0):
    from osc_geo_h3grid_srv_spark.sources.pages import synthesize_pages_pdf
    pdf = synthesize_pages_pdf(start, n)
    return [(r.url, r.warc_ts, bytes(r.html))
            for r in pdf.itertuples(index=False)], pdf


def test_round_trip_parse():
    recs, pdf = _recs(25)
    data = write_warc_bytes(recs)
    got = parse_warc_bytes(data)
    assert len(got) == 25
    assert all(g["error"] is None for g in got)
    for g, (url, ts, html) in zip(got, recs):
        assert g["url"] == url
        assert pd.Timestamp(g["warc_ts"]).tz_localize(None) == \
            pd.Timestamp(ts).floor("s")
        assert g["html"] == html


def test_non_response_records_skipped_and_garbage_quarantined():
    recs, _ = _recs(2)
    data = write_warc_bytes(recs)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    garbage = b"NOT-A-RECORD" * 3
    got = parse_warc_bytes(info + data + garbage)
    oks = [g for g in got if g["error"] is None]
    errs = [g for g in got if g["error"] is not None]
    assert len(oks) == 2            # warcinfo skipped silently
    assert len(errs) == 1           # trailing garbage quarantined
    # a record whose block is not HTTP quarantines but keeps the url
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    got = parse_warc_bytes(bad)
    assert got[0]["url"] == "http://x/" and got[0]["error"]


def test_distributed_ingest_matches_pages_table(spark, tmp_path):
    recs, pdf = _recs(40)
    half = len(recs) // 2
    for name, part in (("a.warc", recs[:half]), ("b.warc", recs[half:])):
        with open(os.path.join(tmp_path, name), "wb") as fh:
            fh.write(write_warc_bytes(part))
    out = pages_from_warc(spark, str(tmp_path)).toPandas()
    assert out["error"].isna().all()
    out = out.sort_values("url").reset_index(drop=True)
    want = pdf.sort_values("url").reset_index(drop=True)
    assert list(out["url"]) == list(want["url"])
    # html bytes AND extracted text byte-identical to the pages table
    assert all(bytes(a) == bytes(b)
               for a, b in zip(out["html"], want["html"]))
    assert list(out["text"]) == list(want["text"])
    assert (pd.to_datetime(out["warc_ts"]).dt.floor("s")
            == pd.to_datetime(want["warc_ts"]).dt.floor("s")).all()
    # lang is the language-ID of the extracted text (own invariant)
    from osc_geo_h3grid_srv_spark.functions.text import lang_id
    assert list(out["lang"]) == list(lang_id(out["text"].astype(str)))


def test_cdx_offsets_slice_to_exact_records():
    # every (offset, length) must slice the container to EXACTLY one
    # clean record equal to the sequential parse's record, and the
    # records must tile the file with no gaps (writer emits no padding).
    recs, _ = _recs(30)
    data = write_warc_bytes(recs)
    got = parse_warc_bytes(data, with_offsets=True)
    assert len(got) == 30
    pos = 0
    for g, (url, _, html) in zip(got, recs):
        assert g["offset"] == pos
        chunk = data[g["offset"]:g["offset"] + g["length"]]
        sub = parse_warc_bytes(chunk)
        assert len(sub) == 1 and sub[0]["error"] is None
        assert sub[0]["url"] == url and sub[0]["html"] == html
        pos += g["length"]
    assert pos == len(data)


def test_surt_urlkey(spark):
    from pyspark.sql import functions as F
    from osc_geo_h3grid_srv_spark.operators.weburl import surt_urlkey
    cases = [
        ("https://www.example.org/a/b?x=1", "org,example)/a/b?x=1"),
        ("http://sub.site.co.uk/", "uk,co,site,sub)/"),
        ("https://host.com", "com,host)/"),
        ("https://Host.COM:8080/p#frag", "com,host)/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in
           df.select(surt_urlkey(F.col("url"))).collect()]
    assert got == [w for _, w in cases]


def test_cdx_random_access_e2e(spark, tmp_path):
    import hashlib
    recs, pdf = _recs(40)
    # two files to exercise per-file offset spaces
    (tmp_path / "a.warc").write_bytes(write_warc_bytes(recs[:25]))
    (tmp_path / "b.warc").write_bytes(write_warc_bytes(recs[25:]))
    from osc_geo_h3grid_srv_spark.sources.warc import (
        cdx_from_warc, fetch_warc_records)
    cdx = cdx_from_warc(spark, str(tmp_path))
    rows = cdx.toPandas()
    assert len(rows) == 40
    assert set(rows["filename"]) == {"a.warc", "b.warc"}
    fetched = fetch_warc_records(spark, cdx, str(tmp_path)).toPandas()
    assert len(fetched) == 40
    assert fetched["error"].isna().all()
    want = {url: hashlib.md5(html).hexdigest() for url, _, html in recs}
    got = dict(zip(fetched["url"], fetched["digest"]))
    assert got == want
