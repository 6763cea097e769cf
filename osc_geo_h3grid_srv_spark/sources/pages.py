"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md SS1).

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Everything derives from splitmix64(row_index): no RNG state, so any row
range can be generated independently on any executor (mapInPandas over an
id range) and regenerating is idempotent - the basis for the byte-identical
text invariant and for distributed generation at bench scale.

Geo anchors: 80% of pages cluster around 12 city centers (creating the
hot-cell skew the engine must handle - BASELINE.json north_rule), 20%
uniform in lat [-60, 85] (the reference's world clip, geomesh.py:47-48);
~10% of pages carry no anchor; some carry 2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.text import extract_text, mix64, LANGS

# 12 skew cluster centers (lat, lng) - Berlin and Kingston mirror the
# reference's example data; the rest are plausible dense-web cities.
CITY_CENTERS = np.array([
    [52.52, 13.40],     # Berlin (docs example, README-geospatial.md:142)
    [17.97, -76.79],    # Kingston (jamaica_buildings)
    [40.71, -74.01],
    [51.51, -0.13],
    [35.68, 139.69],
    [37.77, -122.42],
    [48.86, 2.35],
    [-23.55, -46.63],
    [19.43, -99.13],
    [28.61, 77.21],
    [-33.87, 151.21],
    [50.95, 6.95],      # Cologne (correlator tests)
])

_U64 = np.uint64
_SECONDS_PER_YEAR = 31536000


def _u(h, shift):
    return (np.asarray(h, dtype=np.uint64) >> _U64(shift))


def _unit(h, shift):
    """uniform [0,1) from bits of h."""
    return ((_u(h, shift) & _U64(0xFFFFFFFF)).astype(np.float64)
            / float(1 << 32))


_VOCAB = np.array(
    ("data grid cell index page table query spark merge scan filter join "
     "window batch stream risk flood river city street value record schema "
     "shuffle partition broadcast sample cluster anchor tile mesh vector "
     "raster layer region polygon point radius centroid resolution parent "
     "snapshot manifest lineage executor kernel boundary vertex face "
     "hexagon pentagon overage digit lattice azimuth gnomonic sphere").split())


def _body_words(src_idx: np.ndarray, lang_src=None, min_w=14, max_w=40):
    """deterministic word sequence per source index (vectorized)."""
    hb = mix64(src_idx ^ _U64(0x5DEECE66D))
    # language flavor: 3 marker words of the source's language lead the body
    from ..functions.text import _LANG_MARKERS
    src_lang = np.array(LANGS, dtype=object)[(mix64(src_idx) % _U64(5)).astype(np.int64)]
    lm = mix64(src_idx) % _U64(5)
    lead = np.array([" ".join(_LANG_MARKERS[l][:4] * 2) for l in LANGS],
                    dtype=object)[lm.astype(np.int64)]
    nw = (min_w + (hb % _U64(max_w - min_w)).astype(np.int64))
    wmax = int(nw.max()) if len(nw) else 0
    vocab = np.array(_VOCAB).astype(str)  # '<U' dtype throughout
    out = lead.astype(str)
    for pos in range(wmax):
        hp = mix64(hb + _U64(pos * 2654435761 + 1))
        w = vocab[(hp % _U64(len(vocab))).astype(np.int64)]
        w = np.where(pos < nw, np.char.add(" ", w), "").astype(str)
        out = np.char.add(out, w)
    return out


def synthesize_pages_pdf(start: int, count: int) -> pd.DataFrame:
    """generate rows [start, start+count) of the pages table."""
    i = np.arange(start, start + count, dtype=np.uint64)
    h = mix64(i)
    h2 = mix64(h ^ _U64(0xA5A5A5A5A5A5A5A5))
    h3_ = mix64(h2 ^ _U64(0x123456789ABCDEF))

    url = np.char.add(
        np.char.add("https://example-",
                    (h % _U64(1000)).astype(np.int64).astype(str)),
        np.char.add(".org/page/", i.astype(np.int64).astype(str)))
    warc_ts = (np.datetime64("2024-01-01T00:00:00")
               + (h % _U64(_SECONDS_PER_YEAR)).astype("timedelta64[s]"))
    lang = np.array(LANGS, dtype=object)[(h % _U64(5)).astype(np.int64)]

    # planted duplicates: content (title/body/anchors) derives from a
    # SOURCE index so ~2% of pages are exact full-text dups of an earlier
    # page (h%50==7) and ~3% near-dups (h%50==8, one word appended);
    # url/warc_ts/lang stay the row's own.
    dup_kind = (h % _U64(50)).astype(np.int64)
    back = (h % _U64(997)).astype(np.int64) + 1
    src = i.astype(np.int64).copy()
    is_dup = (dup_kind == 7) & (src - back >= 0)
    is_near = (dup_kind == 8) & (src - back >= 0)
    src = np.where(is_dup | is_near, src - back, src).astype(np.uint64)
    hc = mix64(src)
    hc2 = mix64(hc ^ _U64(0xA5A5A5A5A5A5A5A5))
    hc3 = mix64(hc2 ^ _U64(0x123456789ABCDEF))

    # anchors: 10% none, 80% of the rest clustered, else uniform
    has_anchor = _unit(hc, 3) >= 0.10
    second_anchor = has_anchor & (_unit(hc, 7) < 0.15)
    clustered = _unit(hc2, 5) < 0.80
    city = (hc2 % _U64(12)).astype(np.int64)
    # box-muller-ish gaussian offsets from hash bits (sigma ~0.25 deg)
    g1 = _unit(hc2, 11)
    g2 = _unit(hc2, 29)
    r = np.sqrt(-2.0 * np.log(np.maximum(g1, 1e-12))) * 0.25
    lat_c = CITY_CENTERS[city, 0] + r * np.cos(2 * np.pi * g2)
    lng_c = CITY_CENTERS[city, 1] + r * np.sin(2 * np.pi * g2)
    lat_u = -60.0 + _unit(hc3, 5) * 145.0
    lng_u = -180.0 + _unit(hc3, 23) * 360.0
    lat = np.where(clustered, lat_c, lat_u)
    lng = np.where(clustered, lng_c, lng_u)
    lat = np.clip(lat, -60.0, 85.0)
    lng = (lng + 180.0) % 360.0 - 180.0
    # second anchor: small offset from the first
    lat2 = np.clip(lat + (_unit(hc3, 41) - 0.5) * 0.2, -60.0, 85.0)
    lng2 = (lng + (_unit(hc3, 51) - 0.5) * 0.2 + 180.0) % 360.0 - 180.0

    title_w = (hc % _U64(997)).astype(np.int64)

    body = _body_words(src)
    near_extra = np.where(
        is_near,
        np.char.add(" extra", (h % _U64(97)).astype(np.int64).astype(str)),
        "").astype(str)
    body = np.char.add(body.astype(str), near_extra)

    # templated html (vectorized string assembly)
    anchor1 = np.where(
        has_anchor,
        np.char.add(np.char.add(
            '<span class="geo">',
            np.char.add(np.char.mod("%.6f", lat), np.char.add(",", np.char.mod("%.6f", lng)))),
            "</span>"),
        "")
    anchor2 = np.where(
        second_anchor,
        np.char.add(np.char.add(
            '<span class="geo">',
            np.char.add(np.char.mod("%.6f", lat2), np.char.add(",", np.char.mod("%.6f", lng2)))),
            "</span>"),
        "")
    # outlinks: up to 2 <a href> elements targeting EARLIER pages
    # (target index uniform over [0, i), so any generated prefix is a
    # closed link graph). EMPTY anchor text: the tags strip to
    # whitespace, so extract_text output — and every downstream text
    # invariant — is byte-identical to the link-free corpus. Link
    # identity derives from the ROW hash h (not the content-source
    # hash), so planted content dups legitimately carry different
    # outlinks, like real mirrored pages.
    hl1 = mix64(h ^ _U64(0x1111111111111111))
    hl2 = mix64(h ^ _U64(0x2222222222222222))
    imax = np.maximum(i, _U64(1))
    t1 = (hl1 % imax).astype(np.int64)
    t2 = (hl2 % imax).astype(np.int64)
    has_l1 = (i > _U64(0)) & ((hl1 >> _U64(61)) != _U64(0))   # 7/8
    has_l2 = (i > _U64(0)) & ((hl2 >> _U64(62)) == _U64(0))   # 1/4

    def _link_tag(t):
        host_n = (mix64(t.astype(np.uint64)) % _U64(1000)) \
            .astype(np.int64).astype(str)
        return np.char.add(
            np.char.add('<a href="https://example-', host_n),
            np.char.add(".org/page/",
                        np.char.add(t.astype(str), '"></a>')))

    link1 = np.where(has_l1, _link_tag(t1), "").astype(str)
    link2 = np.where(has_l2, _link_tag(t2), "").astype(str)

    html_str = np.char.add(
        np.char.add(
            np.char.add("<html><head><title>Page ", title_w.astype(str)),
            "</title></head><body><p>"),
        np.char.add(
            np.char.add(body.astype(str), "</p>"),
            np.char.add(np.char.add(anchor1, anchor2),
                        np.char.add(np.char.add(link1, link2),
                                    "</body></html>"))))

    html = pd.Series([s.encode("utf-8") for s in html_str.tolist()])
    pdf = pd.DataFrame({
        "url": url,
        "warc_ts": pd.Series(warc_ts),
        "html": html,
        "lang": lang,
    })
    pdf["text"] = extract_text(pdf["html"])
    return pdf[["url", "warc_ts", "html", "text", "lang"]]


# bump when the generator's output changes so materialized caches
# (bench.prepare_pages) are keyed to the generation, not just the count
PAGES_VERSION = 2

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_dataframe(spark, n_rows: int, partitions: int = 32,
                    start: int = 0):
    """distributed deterministic generation: each partition materializes
    its own id range via mapInPandas (no driver-side data). `start`
    offsets the id range — rows [start, start+n_rows) are byte-identical
    to the same rows of any larger run (splitmix64 per id)."""
    bounds = spark.range(start, start + n_rows, 1, partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids within a spark.range partition are contiguous
            out = synthesize_pages_pdf(int(ids.min()), len(ids))
            yield out

    return bounds.mapInPandas(gen, schema=PAGES_SCHEMA)
