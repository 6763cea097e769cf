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
