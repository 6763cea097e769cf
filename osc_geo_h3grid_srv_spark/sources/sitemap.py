"""Sitemap source: the sitemaps.org XML protocol (public spec) as a
distributed ingest path.

Crawl pipelines seed and refresh their frontier from sitemaps: a site
declares its URLs with optional <lastmod>/<changefreq>/<priority>
hints, and index files (<sitemapindex>) point at child sitemaps. This
module provides a from-scratch writer (fixture/source side) and a REAL
XML parser (stdlib xml.etree — no external libs) behind the same
quarantine discipline as the media codecs: a malformed payload becomes
an error row, never a failed job.

Distributed grain: one task per sitemap payload (a sitemap is capped
at 50k URLs by the spec, so per-row work is bounded by protocol), one
mapInPandas pass, explode to URL rows. Everything downstream (host
rollups, frontier joins) is relational.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

#: the spec's <changefreq> vocabulary
CHANGEFREQS = ("always", "hourly", "daily", "weekly", "monthly",
               "yearly", "never")


class SitemapParseError(ValueError):
    pass


def encode_sitemap(entries, index: bool = False) -> bytes:
    """writer (fixture/source side). entries: list of dicts with `loc`
    and optional `lastmod`, `changefreq`, `priority`. index=True emits
    a <sitemapindex> of <sitemap> children (loc/lastmod only)."""
    root = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           f'<{root} xmlns="{SITEMAP_NS}">']
    for e in entries:
        out.append(f"<{child}>")
        out.append(f"<loc>{escape(str(e['loc']))}</loc>")
        for k in ("lastmod", "changefreq", "priority"):
            if e.get(k) is not None:
                out.append(f"<{k}>{escape(str(e[k]))}</{k}>")
        out.append(f"</{child}>")
    out.append(f"</{root}>")
    return "".join(out).encode("utf-8")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(buf: bytes) -> tuple[bool, list[dict]]:
    """-> (is_index, rows). Real XML parse (namespace-agnostic via
    local names, per the many slightly-off real-world sitemaps);
    malformed XML, an unexpected root, or a child without <loc> raises
    SitemapParseError. Parse-level surprises (encoding garbage etc.)
    are normalized to SitemapParseError — the quarantine chokepoint
    contract shared with the media codecs."""
    try:
        root = ET.fromstring(buf)
        rname = _local(root.tag)
        if rname not in ("urlset", "sitemapindex"):
            raise SitemapParseError(f"sitemap: bad root <{rname}>")
        is_index = rname == "sitemapindex"
        want = "sitemap" if is_index else "url"
        rows = []
        for el in root:
            if _local(el.tag) != want:
                continue
            row = {"loc": None, "lastmod": None, "changefreq": None,
                   "priority": None}
            for f in el:
                name = _local(f.tag)
                if name in row:
                    row[name] = (f.text or "").strip()
            if not row["loc"]:
                raise SitemapParseError(
                    f"sitemap: <{want}> without <loc>")
            if row["priority"] is not None:
                row["priority"] = float(row["priority"])
            if (row["changefreq"] is not None
                    and row["changefreq"] not in CHANGEFREQS):
                raise SitemapParseError(
                    f"sitemap: bad changefreq {row['changefreq']!r}")
            rows.append(row)
        return is_index, rows
    except SitemapParseError:
        raise
    except (ET.ParseError, ValueError, UnicodeDecodeError,
            LookupError, OverflowError) as e:
        # LookupError: a corrupted <?xml encoding=...?> declaration
        # names an unknown codec (found by mutation fuzzing)
        raise SitemapParseError(
            f"sitemap: malformed payload: {type(e).__name__}: {e}") \
            from e


def sitemap_urls(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "sitemap_id",
                 carry_cols: tuple = ()) -> DataFrame:
    """one row per declared URL: (sitemap_id, loc, lastmod, changefreq,
    priority, is_index, error). Malformed payloads yield ONE quarantine
    row (loc NULL, error set) so every input is accounted for. Index
    files' children come back with is_index=true — the caller feeds
    those locs into the next fetch round (sitemap trees are fetched
    level by level; this operator is one level's parse).

    `carry_cols` passes input columns through the mapInPandas schema
    unchanged — streaming callers carry the fetch timestamp this way
    instead of joining it back (a stream-stream self-join holds
    unbounded state)."""
    carry = [c for c in carry_cols]
    schema = (f"{id_col} long, loc string, lastmod string, "
              "changefreq string, priority double, is_index boolean, "
              "error string") + "".join(
        f", {df.schema[c].name} {df.schema[c].dataType.simpleString()}"
        for c in carry)

    def gen(batches):
        for pdf in batches:
            rows = []
            for sid, payload, *extras in zip(
                    pdf[id_col], pdf[payload_col],
                    *(pdf[c] for c in carry)):
                if payload is None:
                    # failed fetch upstream: honor the never-fail
                    # contract with a quarantine row, not a TypeError
                    rows.append((int(sid), None, None, None, None,
                                 None, "sitemap: null payload",
                                 *extras))
                    continue
                try:
                    is_index, parsed = parse_sitemap(bytes(payload))
                    for r in parsed:
                        rows.append((int(sid), r["loc"], r["lastmod"],
                                     r["changefreq"], r["priority"],
                                     is_index, None, *extras))
                except SitemapParseError as e:
                    rows.append((int(sid), None, None, None, None,
                                 None, str(e), *extras))
            yield pd.DataFrame(rows, columns=[
                id_col, "loc", "lastmod", "changefreq", "priority",
                "is_index", "error", *carry])

    return df.select(id_col, payload_col, *carry).mapInPandas(
        gen, schema=schema)
