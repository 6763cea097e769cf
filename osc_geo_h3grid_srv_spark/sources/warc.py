"""WARC/1.0 container source — the wire format Common Crawl ships
(public spec, ISO 28500 / IIPC warc-specifications): a concatenation of
records, each `WARC/1.0\\r\\n` + header lines + blank line + a
Content-Length-delimited block + `\\r\\n\\r\\n`. Response records carry
an HTTP response (status line + headers + blank line + body) as their
block; the body is the page HTML.

This module gives the engine a real crawl-container ingest path in
front of the pages table:

* `write_warc_bytes` — serializer used to synthesize deterministic
  fixture files (and to round-trip-test the parser);
* `parse_warc_bytes` — from-scratch record splitter: header scan,
  Content-Length-driven block read, HTTP head strip. Malformed records
  are QUARANTINED as error rows (same policy as the BMP/WAV decoders),
  never raised — one broken record in a 1 GB file must not kill the
  task;
* `pages_from_warc` — distributed ingest: `binaryFile` scan (one task
  per WARC file — the standard grain; crawl archives ship ~1 GB files)
  -> mapInPandas parse -> the canonical pages schema, with `text` via
  the byte-identical `extract_text` and `lang` via the n-gram
  language-ID, both inside the same Arrow pass.

Scale note: `binaryFile` materializes each file as ONE row, so the task
memory bound is the largest WARC file (Common Crawl caps ~1 GB —
executor-sized by design). Streaming record iteration inside a custom
datasource would lift that bound; the per-file grain is kept here
because it matches how the archives are actually laid out.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def write_warc_bytes(records) -> bytes:
    """serialize (url, warc_ts, html_bytes) dicts/tuples as WARC/1.0
    response records with an HTTP/1.1 200 payload."""
    out = []
    for r in records:
        url, ts, html = (r["url"], r["warc_ts"], r["html"]) \
            if isinstance(r, dict) else r
        ts = pd.Timestamp(ts)
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + f"Content-Length: {len(html)}\r\n".encode() + _CRLF
                + html)
        head = (b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + ts.strftime("WARC-Date: %Y-%m-%dT%H:%M:%SZ\r\n")
                .encode()
                + f"Content-Length: {len(http)}\r\n".encode())
        out.append(head + _CRLF + http + _SEP)
    return b"".join(out)


def parse_warc_bytes(data: bytes, with_offsets: bool = False) -> list[dict]:
    """split a WARC file into records. Returns dicts with url, warc_ts,
    html, error (None when clean); non-response records are skipped;
    malformed records yield one error row and scanning resumes at the
    next `WARC/1.0` magic.

    with_offsets=True additionally records `offset` (byte position of
    the record's `WARC/1.0` magic) and `length` (full record size
    including the trailing CRLFCRLF) on every clean row — the fields a
    CDX index needs for HTTP-range / seek random access."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 8] != b"WARC/1.0":
            nxt = data.find(b"WARC/1.0", pos)
            if pos > 0 and (nxt > pos or nxt < 0):
                out.append({"url": None, "warc_ts": None, "html": None,
                            "error": f"garbage at offset {pos}"})
            if nxt < 0:
                break
            pos = nxt
        rec_start = pos
        hend = data.find(_SEP, pos)
        if hend < 0:
            out.append({"url": None, "warc_ts": None, "html": None,
                        "error": "truncated header"})
            break
        headers = {}
        for line in data[pos:hend].split(_CRLF)[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            out.append({"url": None, "warc_ts": None, "html": None,
                        "error": "missing/invalid Content-Length"})
            pos = hend + len(_SEP)
            continue
        bstart = hend + len(_SEP)
        block = data[bstart:bstart + clen]
        pos = bstart + clen + len(_SEP)
        if len(block) < clen:
            out.append({"url": None, "warc_ts": None, "html": None,
                        "error": "truncated block"})
            break
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace") or None
        ts = None
        try:
            ts = datetime.strptime(
                headers.get(b"warc-date", b"").decode(),
                "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
        except ValueError:
            pass
        sep = block.find(_SEP)
        if not block.startswith(b"HTTP/") or sep < 0:
            out.append({"url": url, "warc_ts": ts, "html": None,
                        "error": "block is not an HTTP response"})
            continue
        rec = {"url": url, "warc_ts": ts,
               "html": block[sep + len(_SEP):], "error": None}
        if with_offsets:
            rec["offset"] = rec_start
            rec["length"] = pos - rec_start
        out.append(rec)
    return out


WARC_PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                     "text string, lang string, error string")


def pages_from_warc(spark, warc_path: str):
    """distributed WARC ingest -> (url, warc_ts, html, text, lang,
    error). error IS NULL rows match the canonical pages schema; error
    rows are the quarantine channel."""
    from ..functions.text import extract_text, lang_id

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(warc_path)
             .select("content"))

    def parse(batches):
        for pdf in batches:
            for raw in pdf["content"]:
                recs = parse_warc_bytes(bytes(raw))
                if not recs:
                    continue
                rdf = pd.DataFrame(recs)
                ok = rdf["error"].isna() & rdf["html"].notna()
                text = pd.Series([""] * len(rdf), dtype=object)
                if ok.any():
                    text.loc[ok] = extract_text(
                        rdf.loc[ok, "html"]).values
                rdf["text"] = text.where(ok, None)
                langs = pd.Series([None] * len(rdf), dtype=object)
                if ok.any():
                    langs.loc[ok] = lang_id(
                        rdf.loc[ok, "text"].astype(str)).values
                rdf["lang"] = langs
                rdf["warc_ts"] = pd.to_datetime(
                    rdf["warc_ts"], utc=True).dt.tz_localize(None)
                yield rdf[["url", "warc_ts", "html", "text", "lang",
                           "error"]]

    return files.mapInPandas(parse, WARC_PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# CDX index: the public companion format of WARC archives (filename,
# offset, length per record) enabling seek / HTTP-range random access
# without rescanning containers.
# ---------------------------------------------------------------------------

CDX_SCHEMA = ("filename string, url string, warc_ts timestamp, "
              "offset long, length long, digest string")

FETCH_SCHEMA = ("filename string, url string, warc_ts timestamp, "
                "offset long, length long, html binary, digest string, "
                "error string")


def cdx_from_warc(spark, warc_path: str):
    """scan WARC files once and emit the CDX index rows: (filename,
    url, warc_ts, offset, length, md5-hex payload digest) per clean
    response record. Same binaryFile one-task-per-file grain as
    pages_from_warc; quarantined records simply get no index row (they
    are not addressable)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(warc_path)
             .select("path", "content"))

    def scan(batches):
        import hashlib
        for pdf in batches:
            for path, raw in zip(pdf["path"], pdf["content"]):
                recs = [r for r in parse_warc_bytes(bytes(raw),
                                                    with_offsets=True)
                        if r["error"] is None]
                if not recs:
                    continue
                yield pd.DataFrame({
                    "filename": path.rsplit("/", 1)[-1],
                    "url": [r["url"] for r in recs],
                    "warc_ts": pd.to_datetime(
                        [r["warc_ts"] for r in recs],
                        utc=True).tz_localize(None),
                    "offset": [r["offset"] for r in recs],
                    "length": [r["length"] for r in recs],
                    "digest": [hashlib.md5(r["html"]).hexdigest()
                               for r in recs],
                })

    return files.mapInPandas(scan, CDX_SCHEMA)


def fetch_warc_records(spark, cdx, warc_dir: str):
    """random-access record fetch driven by CDX rows (filename, offset,
    length): seek + bounded read + single-record parse, NO container
    rescan — the access pattern a serving layer or a targeted re-crawl
    uses. Rows are grouped per file and read in offset order (one open,
    sequential seeks). Returns the fetched record plus a recomputed
    payload digest; a wrong offset/length surfaces as an error row or a
    digest mismatch, never a wrong-but-plausible page."""
    import os

    def fetch(batches):
        import hashlib
        for pdf in batches:
            rows = []
            for fname, grp in pdf.groupby("filename"):
                fpath = os.path.join(warc_dir, fname)
                g = grp.sort_values("offset")
                with open(fpath, "rb") as fh:
                    for off, ln in zip(g["offset"].values,
                                       g["length"].values):
                        fh.seek(int(off))
                        chunk = fh.read(int(ln))
                        recs = parse_warc_bytes(chunk)
                        if len(recs) == 1 and recs[0]["error"] is None:
                            rec = recs[0]
                            rows.append((fname, rec["url"],
                                         rec["warc_ts"], int(off),
                                         int(ln), rec["html"],
                                         hashlib.md5(rec["html"])
                                         .hexdigest(), None))
                        else:
                            err = (recs[0]["error"] if recs else
                                   "empty range")
                            rows.append((fname, None, None,
                                         int(off),
                                         int(ln), None, None,
                                         f"bad range: {err}"))
            if rows:
                pdf_out = pd.DataFrame(
                    rows, columns=["filename", "url", "warc_ts",
                                   "offset", "length", "html", "digest",
                                   "error"])
                pdf_out["warc_ts"] = pd.to_datetime(
                    pdf_out["warc_ts"], utc=True).dt.tz_localize(None)
                yield pdf_out

    return cdx.select("filename", "offset", "length") \
        .mapInPandas(fetch, FETCH_SCHEMA)
