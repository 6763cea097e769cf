"""Minimal ESRI shapefile I/O — no geopandas/shapely/pyshp.

Implements the public ESRI Shapefile Technical Description (July 1998):
main file (.shp) polygon records (shape types 5 Polygon, 15 PolygonZ,
25 PolygonM — Z/M payloads skipped), the .shx index, and a dBASE III
(.dbf) attribute table for polygon names. This closes SURVEY.md S4: the
reference loads real shapefiles via geopandas.read_file
(src/shape/shape.py:40) and every --shapefile CLI/REST call takes one;
round 1 only read GeoJSON bundles.

Conventions (spec section "Polygon"):
* points are (X=longitude, Y=latitude) doubles, little-endian
* rings are closed (first point == last); vertex order CLOCKWISE in
  (X, Y) = exterior shell, counter-clockwise = hole
* record headers are big-endian; lengths counted in 16-bit words
"""

from __future__ import annotations

import os
import struct

import numpy as np


def _ring_is_ccw(xy: np.ndarray) -> bool:
    """positive shoelace in (x, y) = counter-clockwise = hole."""
    x, y = xy[:, 0], xy[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) > 0.0


def read_shp(path: str):
    """parse a polygon .shp main file.

    Returns a list with one entry per record: a list of
    (ring_latlng (K,2) float64, is_hole bool) tuples; Null-shape records
    yield an empty list."""
    with open(path, "rb") as fh:
        data = fh.read()
    if len(data) < 100:
        raise ValueError(f"{path}: too short for a shapefile header")
    if struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError(f"{path}: bad shapefile file code")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    records = []
    pos = 100
    while pos + 8 <= min(file_len, len(data)):
        _recno, content_words = struct.unpack(">ii", data[pos:pos + 8])
        pos += 8
        end = pos + content_words * 2
        stype = struct.unpack("<i", data[pos:pos + 4])[0]
        if stype == 0:  # Null shape
            records.append([])
        elif stype in (5, 15, 25):
            num_parts, num_points = struct.unpack(
                "<ii", data[pos + 36:pos + 44])
            parts = np.frombuffer(data, dtype="<i4", count=num_parts,
                                  offset=pos + 44)
            pts = np.frombuffer(
                data, dtype="<f8", count=num_points * 2,
                offset=pos + 44 + 4 * num_parts).reshape(-1, 2)
            bounds = list(parts) + [num_points]
            rings = []
            for i in range(num_parts):
                xy = pts[bounds[i]:bounds[i + 1]]
                if len(xy) < 3:
                    continue
                # (x=lng, y=lat) -> engine's (lat, lng)
                rings.append((xy[:, ::-1].copy(), _ring_is_ccw(xy)))
            records.append(rings)
        else:
            raise ValueError(
                f"{path}: unsupported shape type {stype} "
                "(only polygon types 5/15/25)")
        pos = end
    return records


def read_dbf(path: str):
    """minimal dBASE III reader: one dict of stripped string/numeric
    values per (non-deleted) record."""
    with open(path, "rb") as fh:
        data = fh.read()
    if len(data) < 32:
        raise ValueError(f"{path}: too short for a dbf header")
    n_rec = struct.unpack("<i", data[4:8])[0]
    hdr_size, rec_size = struct.unpack("<hh", data[8:12])
    fields = []
    p = 32
    while p + 32 <= len(data) and data[p] != 0x0D and p < hdr_size:
        name = data[p:p + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[p + 11])
        flen = data[p + 16]
        fields.append((name, ftype, flen))
        p += 32
    out = []
    p = hdr_size
    for _ in range(max(n_rec, 0)):
        if p + rec_size > len(data):
            break
        rec = data[p:p + rec_size]
        p += rec_size
        if rec[0:1] == b"*":  # deleted
            continue
        vals, q = {}, 1
        for (name, ftype, flen) in fields:
            raw = rec[q:q + flen].decode("ascii", "replace").strip()
            q += flen
            if ftype in ("N", "F") and raw:
                try:
                    vals[name] = float(raw) if "." in raw else int(raw)
                except ValueError:
                    vals[name] = raw
            else:
                vals[name] = raw
        out.append(vals)
    return out


def read_prj(path: str):
    """minimal .prj (WKT) sniffing: returns {"utm_zone": int, "south":
    bool} for WGS84/UTM projections, {} for geographic EPSG:4326, None
    when unrecognized. Matches both ESRI ("UTM_Zone_33N") and OGC
    ('UTM zone 33N' / AUTHORITY EPSG 326xx/327xx) spellings."""
    import re
    with open(path) as fh:
        wkt = fh.read()
    m = re.search(r"UTM[_ ]zone[_ ](\d{1,2})([NS])", wkt, re.IGNORECASE)
    if m:
        return {"utm_zone": int(m.group(1)),
                "south": m.group(2).upper() == "S"}
    m = re.search(r'"EPSG"\s*,\s*"?32([67])(\d{2})"?', wkt)
    if m:
        return {"utm_zone": int(m.group(2)),
                "south": m.group(1) == "7"}
    if re.search(r"GEOGCS|4326", wkt):
        return {}
    return None


def packed_from_shapefile(shp_path: str, dbf_path: str | None = None,
                          name_field: str | None = None):
    """.shp (+ optional .dbf names) -> PackedPolygons in EPSG:4326. One
    packed polygon per shapefile record (a record is a Polygon or
    MultiPolygon with holes; even-odd containment over all its rings is
    winding-exact, so hole-to-shell assignment is not needed).

    If a sibling .prj declares a WGS84/UTM projection, coordinates are
    reprojected to lat/lng on load (functions/crs.py) — the reference's
    `transform` verb / `transform_to_epsg_4326` (shape.py:278-290)."""
    from ..functions.geo import PackedPolygons
    if dbf_path is None:
        guess = os.path.splitext(shp_path)[0] + ".dbf"
        dbf_path = guess if os.path.exists(guess) else None
    records = read_shp(shp_path)
    prj_path = os.path.splitext(shp_path)[0] + ".prj"
    utm = None
    if os.path.exists(prj_path):
        info = read_prj(prj_path)
        if info is None:
            raise ValueError(
                f"{prj_path}: unsupported CRS (only EPSG:4326 and "
                "WGS84/UTM zones)")
        if info:
            utm = info
    if utm is not None:
        from ..functions import crs
        for rings in records:
            for i, (latlng, is_hole) in enumerate(rings):
                # projected .shp stores (x=easting, y=northing); the
                # reader put them at (lat=y, lng=x) = (northing, easting)
                la, lo = crs.from_utm(latlng[:, 1], latlng[:, 0],
                                      utm["utm_zone"], utm["south"])
                rings[i] = (np.stack([la, lo], axis=1), is_hole)
    attrs = read_dbf(dbf_path) if dbf_path else []
    coords, rs, re_, rp, rh, names = [], [], [], [], [], []
    pos = 0
    pidx = 0
    for i, rings in enumerate(records):
        if not rings:
            continue
        name = None
        if i < len(attrs):
            a = attrs[i]
            if name_field is not None:
                name = str(a.get(name_field, "")) or None
            else:
                for v in a.values():  # first non-empty text attribute
                    if isinstance(v, str) and v:
                        name = v
                        break
        if name is None:
            name = f"poly{pidx}"
        for latlng, is_hole in rings:
            ring = latlng
            if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]
            coords.append(np.asarray(ring, dtype=np.float64))
            rs.append(pos)
            pos += len(ring)
            re_.append(pos)
            rp.append(pidx)
            rh.append(bool(is_hole))
        names.append(name)
        pidx += 1
    if not coords:
        raise ValueError(f"{shp_path}: no polygon rings")
    return PackedPolygons(np.concatenate(coords), rs, re_, rp, rh, names)


# ---------------------------------------------------------------------------
# writer (K4 sibling: the reference writes transformed/buffered/simplified
# shapefiles back out via gdf.to_file, src/shape/shape.py:196-266)
# ---------------------------------------------------------------------------

_WGS84_WKT = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
              '6378137,298.257223563]],PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433],'
              'AUTHORITY["EPSG","4326"]]')


def write_shapefile(records, base_path: str, names=None,
                    prj_wkt: str | None = _WGS84_WKT):
    """write .shp + .shx + .dbf (+ .prj) for polygon `records`.

    records: list per record of [(ring_latlng (K,2), is_hole), ...].
    Rings are closed and re-wound to spec (shell CW, hole CCW in x,y).
    names: optional per-record strings -> a 'name' C(32) dbf column.
    prj_wkt: CRS WKT for the sidecar .prj (default EPSG:4326; None
    skips the file)."""
    shp_path = base_path + ".shp"
    shx_path = base_path + ".shx"
    dbf_path = base_path + ".dbf"
    if prj_wkt:
        with open(base_path + ".prj", "w") as fh:
            fh.write(prj_wkt)
    rec_blobs = []
    allx, ally = [], []
    for rings in records:
        parts, pts = [], []
        for latlng, is_hole in rings:
            ring = np.asarray(latlng, dtype=np.float64)
            if len(ring) < 3:
                continue
            xy = ring[:, ::-1].copy()  # (lat,lng) -> (x=lng, y=lat)
            if not np.allclose(xy[0], xy[-1]):
                xy = np.vstack([xy, xy[:1]])
            if _ring_is_ccw(xy) != bool(is_hole):
                xy = xy[::-1]
            parts.append(len(pts))
            pts.extend(xy.tolist())
        if not pts:
            # every ring degenerated (<3 points, e.g. simplify with a
            # large tolerance): emit an ESRI Null shape so the record
            # count stays aligned with the dbf rows (ADVICE r02 — this
            # used to crash on pts[:,0].min() over an empty array)
            rec_blobs.append(struct.pack("<i", 0))
            continue
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
        allx.extend(pts[:, 0].tolist())
        ally.extend(pts[:, 1].tolist())
        box = (pts[:, 0].min(), pts[:, 1].min(),
               pts[:, 0].max(), pts[:, 1].max())
        blob = struct.pack("<i4dii", 5, *box, len(parts), len(pts))
        blob += np.asarray(parts, dtype="<i4").tobytes()
        blob += pts.astype("<f8").tobytes()
        rec_blobs.append(blob)
    if not allx:
        raise ValueError(
            "write_shapefile: no non-degenerate rings remain (every ring "
            "has < 3 points or records is empty); nothing to save")

    def header(total_words, bbox):
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, 5)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
        return h

    bbox = (min(allx), min(ally), max(allx), max(ally))
    shp_words = 50 + sum((8 + len(b)) // 2 for b in rec_blobs)
    shx_words = 50 + 4 * len(rec_blobs)
    with open(shp_path, "wb") as shp, open(shx_path, "wb") as shx:
        shp.write(header(shp_words, bbox))
        shx.write(header(shx_words, bbox))
        offset = 50
        for i, b in enumerate(rec_blobs):
            shp.write(struct.pack(">ii", i + 1, len(b) // 2))
            shp.write(b)
            shx.write(struct.pack(">ii", offset, len(b) // 2))
            offset += 4 + len(b) // 2
    names = list(names) if names is not None else [
        f"poly{i}" for i in range(len(records))]
    flen = 32
    with open(dbf_path, "wb") as dbf:
        hdr_size = 32 + 32 + 1
        rec_size = 1 + flen
        dbf.write(struct.pack("<4B i hh 20x", 3, 24, 1, 1, len(names),
                              hdr_size, rec_size))
        dbf.write(b"name".ljust(11, b"\x00") + b"C"
                  + b"\x00" * 4 + bytes([flen]) + b"\x00" * 15)
        dbf.write(b"\x0d")
        for n in names:
            dbf.write(b" " + n.encode("ascii", "replace")[:flen]
                      .ljust(flen, b" "))
        dbf.write(b"\x1a")
    return shp_path, shx_path, dbf_path
