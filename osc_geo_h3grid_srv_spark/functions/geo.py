"""Vectorized geometry kernel (NumPy): point-in-polygon, distances,
polyfill, polygon statistics, simplification.

Replaces the reference's shapely/geopandas usage (not installable here):
- PIP: shape.py:355-387 (point_within_shape / sjoin) -> ray casting
- polyfill: shape.py:482-520 (h3.polyfill per polygon, centroid
  containment, coords pre-reversed to (lat,lng)) -> sample-grid polyfill
  over the h3core kernel, same centroid-containment semantics
- buffer: geomesh.py:1318-1329 (get_buffer: sqrt(cell_km2/pi)/110*1.5 deg
  for res>=2) -> distance-to-boundary test == round-join polygon buffer
- radius predicate: geomesh.py:1252-1299 spherical law of cosines with
  the reference's EXACT constants 0.0175 (not pi/180) and R=6371
- stats: shape.py:74-155 -> planar polygon metrics
- simplify: shape.py:180-198 -> Douglas-Peucker

Internal convention: coordinates are (lat, lng) degrees everywhere
(SURVEY.md F12); GeoJSON I/O converts from (lng, lat).
"""

from __future__ import annotations

import json
import math

import numpy as np

from . import h3core

# reference constants (geomesh.py:44-48, 1290-1296)
KM_PER_DEGREE = 110.0
MIN_LAT = -60.0
MAX_LAT = 85.0
REF_DEG2RAD = 0.0175          # geomesh.py radius SQL constant (not pi/180)
REF_EARTH_RADIUS_KM = 6371.0
EARTH_CIRCUMFERENCE_KM = 40075.0


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

def reference_radius_km(lat, lng, center_lat, center_lng):
    """great-circle distance with the reference's exact formula and
    constants (geomesh.py:1290-1296): spherical law of cosines with
    deg->rad factor 0.0175 and R=6371. Used for radius-query parity."""
    lat = np.asarray(lat, dtype=np.float64) * REF_DEG2RAD
    lng = np.asarray(lng, dtype=np.float64) * REF_DEG2RAD
    clat = center_lat * REF_DEG2RAD
    clng = center_lng * REF_DEG2RAD
    d = np.sin(lat) * math.sin(clat) + np.cos(lat) * math.cos(clat) * np.cos(
        clng - lng)
    return np.arccos(np.clip(d, -1.0, 1.0)) * REF_EARTH_RADIUS_KM


def haversine_km(lat1, lng1, lat2, lng2):
    la1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lo1 = np.radians(np.asarray(lng1, dtype=np.float64))
    la2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lo2 = np.radians(np.asarray(lng2, dtype=np.float64))
    a = np.sin((la2 - la1) / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(
        (lo2 - lo1) / 2) ** 2
    return 2 * 6371.0088 * np.arcsin(np.sqrt(a))


def min_radius_km(res):
    """minimum radius allowed for an h3 radius query at `res`: the hexagon
    side for the average cell area (geomesh.py:1225-1250)."""
    area = h3core.AVG_CELL_AREA_KM2[res]
    return math.sqrt(2 * area / (3 * math.sqrt(3)))


def get_buffer_deg(res):
    """shapefile polyfill pre-buffer width in degrees (geomesh.py:1318-1329):
    sqrt(cell_km2/pi)/110 * 1.5 for res >= 2, else 0."""
    if res < 2:
        return 0.0
    return math.sqrt(h3core.AVG_CELL_AREA_KM2[res] / math.pi) / KM_PER_DEGREE * 1.5


# ---------------------------------------------------------------------------
# polygons: packed multipolygon representation
# ---------------------------------------------------------------------------

class PackedPolygons:
    """N named (multi)polygons packed into flat NumPy arrays, suitable for
    broadcasting to Spark executors.

    rings: (V, 2) float64 (lat, lng) vertices, each ring closed implicitly
    ring_start/ring_end: per-ring slices into rings
    ring_poly: polygon index per ring
    ring_hole: bool per ring (True = interior hole)
    names: per-polygon names (region filter, shape.py:311-312)
    """

    def __init__(self, coords, ring_start, ring_end, ring_poly, ring_hole,
                 names):
        self.coords = np.asarray(coords, dtype=np.float64)
        self.ring_start = np.asarray(ring_start, dtype=np.int64)
        self.ring_end = np.asarray(ring_end, dtype=np.int64)
        self.ring_poly = np.asarray(ring_poly, dtype=np.int64)
        self.ring_hole = np.asarray(ring_hole, dtype=bool)
        self.names = list(names)

    @property
    def n_polys(self):
        return len(self.names)

    @classmethod
    def from_latlng_rings(cls, polys, names=None):
        """polys: list of polygons; each polygon = list of rings; each ring =
        (K,2) array-like of (lat, lng); first ring = shell, rest = holes."""
        coords, rs, re, rp, rh = [], [], [], [], []
        pos = 0
        for p, rings in enumerate(polys):
            for rn, ring in enumerate(rings):
                ring = np.asarray(ring, dtype=np.float64)
                if np.allclose(ring[0], ring[-1]):
                    ring = ring[:-1]
                coords.append(ring)
                rs.append(pos)
                pos += len(ring)
                re.append(pos)
                rp.append(p)
                rh.append(rn > 0)
        names = names if names is not None else [f"poly{p}" for p in
                                                 range(len(polys))]
        return cls(np.concatenate(coords), rs, re, rp, rh, names)

    @classmethod
    def from_geojson(cls, obj_or_path):
        """GeoJSON FeatureCollection / Feature / geometry with Polygon or
        MultiPolygon geometries; GeoJSON is (lng, lat) -> converts."""
        if isinstance(obj_or_path, str):
            with open(obj_or_path) as fh:
                obj = json.load(fh)
        else:
            obj = obj_or_path
        feats = (obj.get("features") if obj.get("type") == "FeatureCollection"
                 else [obj])
        polys, names = [], []
        for f in feats:
            geom = f.get("geometry", f)
            props = f.get("properties") or {}
            name = props.get("name", f"poly{len(polys)}")
            gtype = geom["type"]
            if gtype == "Polygon":
                mps = [geom["coordinates"]]
            elif gtype == "MultiPolygon":
                mps = geom["coordinates"]
            else:
                continue
            for mp in mps:
                rings = [np.asarray(r, dtype=np.float64)[:, ::-1] for r in mp]
                polys.append(rings)
                names.append(name)
        return cls.from_latlng_rings(polys, names)

    def to_arrays(self):
        return (self.coords, self.ring_start, self.ring_end, self.ring_poly,
                self.ring_hole, self.names)

    def filter_name(self, region):
        """subset to polygons with the given name (shape.py:311-312)."""
        keep = [p for p, n in enumerate(self.names) if n == region]
        return self.subset(keep)

    def contains_region(self, region):
        return region in self.names

    def subset(self, poly_ids):
        pid = set(poly_ids)
        remap = {p: n for n, p in enumerate(poly_ids)}
        coords, rs, re, rp, rh = [], [], [], [], []
        pos = 0
        for r in range(len(self.ring_start)):
            p = int(self.ring_poly[r])
            if p not in pid:
                continue
            ring = self.coords[self.ring_start[r]:self.ring_end[r]]
            coords.append(ring)
            rs.append(pos)
            pos += len(ring)
            re.append(pos)
            rp.append(remap[p])
            rh.append(bool(self.ring_hole[r]))
        return PackedPolygons(
            np.concatenate(coords) if coords else np.zeros((0, 2)),
            rs, re, rp, rh, [self.names[p] for p in poly_ids])

    def bounds(self):
        """(lat_min, lat_max, lng_min, lng_max) over all shells."""
        return (self.coords[:, 0].min(), self.coords[:, 0].max(),
                self.coords[:, 1].min(), self.coords[:, 1].max())

    def bounds_per_poly(self):
        out = np.zeros((self.n_polys, 4))
        out[:, 0] = np.inf
        out[:, 2] = np.inf
        out[:, 1] = -np.inf
        out[:, 3] = -np.inf
        for r in range(len(self.ring_start)):
            p = int(self.ring_poly[r])
            ring = self.coords[self.ring_start[r]:self.ring_end[r]]
            out[p, 0] = min(out[p, 0], ring[:, 0].min())
            out[p, 1] = max(out[p, 1], ring[:, 0].max())
            out[p, 2] = min(out[p, 2], ring[:, 1].min())
            out[p, 3] = max(out[p, 3], ring[:, 1].max())
        return out


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized ray casting, planar lat/lng like shapely)
# ---------------------------------------------------------------------------

def points_in_polys(lat, lng, packed: PackedPolygons):
    """(N,) x polygons -> (N,) bool: point inside ANY polygon of the set
    (shell minus holes). Planar even-odd ray casting on the lng axis."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    inside_poly = np.zeros((lat.shape[0], packed.n_polys), dtype=bool)
    crossings = np.zeros((lat.shape[0], packed.n_polys), dtype=np.int64)
    for r in range(len(packed.ring_start)):
        ring = packed.coords[packed.ring_start[r]:packed.ring_end[r]]
        p = int(packed.ring_poly[r])
        y1 = ring[:, 0]
        x1 = ring[:, 1]
        y2 = np.roll(y1, -1)
        x2 = np.roll(x1, -1)
        # ray toward +lng at constant lat; count edge crossings
        # condition: edge straddles the point's lat, intersection lng > lng
        la = lat[:, None]
        lo = lng[:, None]
        straddle = (y1[None, :] > la) != (y2[None, :] > la)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (la - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
                x2[None, :] - x1[None, :])
        hit = straddle & (xint > lo)
        crossings[:, p] += hit.sum(axis=1)
    inside_poly = (crossings % 2) == 1
    return inside_poly.any(axis=1)


def points_to_boundary_deg(lat, lng, packed: PackedPolygons):
    """(N,) min planar distance (degrees) from each point to any polygon
    boundary segment. Used to emulate round-join buffering."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    best = np.full(lat.shape[0], np.inf)
    for r in range(len(packed.ring_start)):
        ring = packed.coords[packed.ring_start[r]:packed.ring_end[r]]
        y1 = ring[:, 0]; x1 = ring[:, 1]
        y2 = np.roll(y1, -1); x2 = np.roll(x1, -1)
        dy = y2 - y1; dx = x2 - x1
        seg2 = dy * dy + dx * dx
        seg2 = np.where(seg2 == 0, 1e-300, seg2)
        py = lat[:, None] - y1[None, :]
        px = lng[:, None] - x1[None, :]
        t = np.clip((py * dy[None, :] + px * dx[None, :]) / seg2[None, :], 0, 1)
        ddy = py - t * dy[None, :]
        ddx = px - t * dx[None, :]
        d2 = ddy * ddy + ddx * ddx
        best = np.minimum(best, np.sqrt(d2.min(axis=1)))
    return best


# ---------------------------------------------------------------------------
# polyfill (centroid containment + optional buffer), reference semantics
# ---------------------------------------------------------------------------

def polyfill(packed: PackedPolygons, res, buffer_deg=0.0, world_clip=True):
    """cells whose centroid lies in the polygons (or within buffer_deg of
    their boundary = round-join buffer, matching shapely buffer +
    h3.polyfill centroid semantics of shape.py:496-520). World-clipped to
    lat in [-60, 85] like geomesh.py:47-48 when world_clip."""
    la_min, la_max, lo_min, lo_max = packed.bounds()
    la_min -= buffer_deg
    la_max += buffer_deg
    lo_min -= buffer_deg
    lo_max += buffer_deg
    if world_clip:
        la_min = max(la_min, MIN_LAT)
        la_max = min(la_max, MAX_LAT)
    if la_min > la_max:
        return np.empty(0, dtype=np.uint64)
    cand = h3core.polyfill_candidates(la_min, la_max, lo_min, lo_max, res)
    clat, clng = h3core.cell_to_latlng(cand)
    if world_clip:
        keep = (clat >= MIN_LAT) & (clat <= MAX_LAT)
        cand, clat, clng = cand[keep], clat[keep], clng[keep]
    # bbox prefilter before the exact tests
    keep = ((clat >= la_min) & (clat <= la_max)
            & (clng >= lo_min) & (clng <= lo_max))
    cand, clat, clng = cand[keep], clat[keep], clng[keep]
    inside = points_in_polys(clat, clng, packed)
    if buffer_deg > 0:
        near = points_to_boundary_deg(clat, clng, packed) <= buffer_deg
        inside = inside | near
    return cand[inside]


# ---------------------------------------------------------------------------
# polygon statistics (A1/A2: shape.py:74-155) - planar like shapely defaults
# ---------------------------------------------------------------------------

def ring_area_perimeter(ring):
    """planar shoelace area (abs) and perimeter of a (K,2) lat/lng ring."""
    y = ring[:, 0]; x = ring[:, 1]
    x2 = np.roll(x, -1); y2 = np.roll(y, -1)
    area = 0.5 * abs(float(np.sum(x * y2 - x2 * y)))
    per = float(np.sum(np.sqrt((x2 - x) ** 2 + (y2 - y) ** 2)))
    return area, per


def polygon_stats(packed: PackedPolygons):
    """per-polygon vertex count, area (shell - holes), perimeter (shell),
    area/perimeter ratio, shape index P/(2*sqrt(pi*A)), hole count
    (shape.py:92-155)."""
    out = []
    for p in range(packed.n_polys):
        verts = 0
        area = 0.0
        perim = 0.0
        holes = 0
        for r in range(len(packed.ring_start)):
            if int(packed.ring_poly[r]) != p:
                continue
            ring = packed.coords[packed.ring_start[r]:packed.ring_end[r]]
            a, pe = ring_area_perimeter(ring)
            verts += len(ring)
            if packed.ring_hole[r]:
                holes += 1
                area -= a
            else:
                area += a
                perim += pe
        shape_idx = perim / (2.0 * math.sqrt(math.pi * area)) if area > 0 else 0.0
        out.append({
            "name": packed.names[p], "num_vertices": verts, "area": area,
            "perimeter": perim,
            "area_perimeter_ratio": area / perim if perim else 0.0,
            "shape_index": shape_idx, "num_holes": holes,
        })
    return out


# ---------------------------------------------------------------------------
# Douglas-Peucker simplification (F9: shape.py:180-198)
# ---------------------------------------------------------------------------

def _clip_ring_convex(subject, clipper):
    """Sutherland-Hodgman: clip (K,2) subject ring by a CONVEX (M,2)
    clipper ring (both lat,lng, any winding). Returns clipped ring
    (possibly empty). Subject may be concave."""
    subject = np.asarray(subject, dtype=np.float64)
    clipper = np.asarray(clipper, dtype=np.float64)
    # ensure counter-clockwise clipper (positive shoelace in (x=lng, y=lat))
    x = clipper[:, 1]; y = clipper[:, 0]
    if np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        clipper = clipper[::-1]
    out = subject
    m = len(clipper)
    for e in range(m):
        if len(out) == 0:
            return out
        ay, ax = clipper[e]
        by, bx = clipper[(e + 1) % m]
        # inside = left of edge a->b
        py = out[:, 0]; px = out[:, 1]
        side = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        inside = side >= 0
        nxt = np.roll(np.arange(len(out)), -1)
        res = []
        for i in range(len(out)):
            j = nxt[i]
            if inside[i]:
                res.append(out[i])
                if not inside[j]:
                    res.append(_seg_intersect(out[i], out[j],
                                              (ay, ax), (by, bx)))
            elif inside[j]:
                res.append(_seg_intersect(out[i], out[j], (ay, ax), (by, bx)))
        out = np.asarray(res, dtype=np.float64).reshape(-1, 2)
    return out


def _seg_intersect(p1, p2, a, b):
    """intersection of segment p1-p2 with infinite line a-b (lat,lng)."""
    p1y, p1x = float(p1[0]), float(p1[1])
    p2y, p2x = float(p2[0]), float(p2[1])
    ay, ax = a; by, bx = b
    d1 = (bx - ax) * (p1y - ay) - (by - ay) * (p1x - ax)
    d2 = (bx - ax) * (p2y - ay) - (by - ay) * (p2x - ax)
    t = d1 / (d1 - d2) if d1 != d2 else 0.0
    return np.array([p1y + t * (p2y - p1y), p1x + t * (p2x - p1x)])


def cell_overlap(packed: PackedPolygons, cells):
    """A5 (geomesh.py:1332-1365): fraction of each H3 cell covered by the
    polygon set. intersection area (planar deg^2, shell minus holes) x
    scale factor 110^2 * cos(mean boundary latitude) / mean cell area km2.
    Reproduces the reference's KM_PER_DEGREE=110 and avg-cell-area
    constants (geomesh.py:45,107-124)."""
    from . import h3core
    cells = np.asarray(cells, dtype=np.uint64).ravel()
    if cells.size == 0:
        return np.empty(0)
    res = int(h3core.get_resolution(cells[:1])[0])
    cell_km2 = h3core.AVG_CELL_AREA_KM2[res]
    bounds = h3core.cell_boundary(cells)  # (N, 6, 2)
    pent = h3core.is_pentagon(cells)
    pent_rings = {}
    if pent.any():
        # round 4 (VERDICT r3 Next #8): pentagons use the published
        # 10-vertex geometry (5 topological + icosa-edge distortion
        # vertices). The distortion kink makes the ring slightly
        # non-convex, so Sutherland-Hodgman against the whole ring is
        # invalid — instead fan-triangulate from the centroid (the ring
        # is star-shaped about it) and sum per-triangle clips, which is
        # exact because the triangles partition the cell.
        pv, pn = h3core.pentagon_boundary_full(cells[pent])
        for j, i in enumerate(np.flatnonzero(pent)):
            pent_rings[int(i)] = pv[j, :pn[j]]

    def _clip_area(ring, window):
        clipped = _clip_ring_convex(ring, window)
        if len(clipped) < 3:
            return 0.0
        a, _ = ring_area_perimeter(clipped)
        return a

    out = np.zeros(cells.shape[0], dtype=np.float64)
    for i in range(cells.shape[0]):
        cring = pent_rings.get(i, bounds[i])
        factor = (110.0 * 110.0
                  * math.cos(math.radians(float(cring[:, 0].mean()))))
        windows = [cring]
        if i in pent_rings:
            ctr = cring.mean(axis=0)
            K = len(cring)
            windows = [np.array([ctr, cring[k], cring[(k + 1) % K]])
                       for k in range(K)]
        area = 0.0
        for r in range(len(packed.ring_start)):
            ring = packed.coords[packed.ring_start[r]:packed.ring_end[r]]
            a = sum(_clip_area(ring, w) for w in windows)
            area += -a if packed.ring_hole[r] else a
        out[i] = max(area, 0.0) * factor / cell_km2
    return out


def _offset_ring(ring, d, is_hole, step):
    """offset one (K,2) planar (y,x) ring outward (shell) / inward
    (hole) by d, with round joins at convex corners (arc every `step`
    rad) and miter-trim joins at reflex corners. Returns the offset ring
    or None if it collapses (< 3 points)."""
    # normalize winding in (x, y): shell CCW, hole CW -> the polygon
    # interior is always LEFT of travel, offset goes RIGHT
    x = ring[:, 1]; y = ring[:, 0]
    ccw = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) > 0
    if ccw == is_hole:
        ring = ring[::-1]
    n = len(ring)
    pts_out = []
    v = np.diff(np.vstack([ring, ring[:1]]), axis=0)  # (n, 2) y,x steps
    dy, dx = v[:, 0], v[:, 1]
    L = np.hypot(dy, dx)
    keep = L > 0
    if keep.sum() < 3:
        return None
    # right normal of (dx, dy) is (dy, -dx)/L -> in (y, x) rows:
    ny = -dx / np.where(L == 0, 1, L)
    nx = dy / np.where(L == 0, 1, L)
    idxs = [i for i in range(n) if keep[i]]
    m = len(idxs)
    starts = [ring[i] + d * np.array([ny[i], nx[i]]) for i in idxs]
    ends = [ring[(i + 1) % n] + d * np.array([ny[i], nx[i]])
            for i in idxs]
    arcs = [[] for _ in range(m)]  # join points AFTER edge k
    for k in range(m):
        i = idxs[k]
        j = idxs[(k + 1) % m]
        vtx = ring[(i + 1) % n]  # shared vertex between edges i, j
        cross = dx[i] * dy[j] - dy[i] * dx[j]  # z of dir_i x dir_j
        if cross > 0:
            # left turn (convex on the outward side): round join —
            # sweep the outward normal from edge i's angle to edge j's
            a0 = math.atan2(ny[i], nx[i])
            a1 = math.atan2(ny[j], nx[j])
            sweep = a1 - a0
            while sweep < 0:
                sweep += 2 * math.pi
            arcs[k] = [vtx + d * np.array(
                [math.sin(a0 + t), math.cos(a0 + t)])
                for t in np.arange(step, sweep, step)]
        elif cross < 0:
            # reflex: trim both edges to the offset-line intersection
            p_int = _seg_intersect(
                starts[k], ends[k],
                (starts[(k + 1) % m][0], starts[(k + 1) % m][1]),
                (ends[(k + 1) % m][0], ends[(k + 1) % m][1]))
            ends[k] = p_int
            starts[(k + 1) % m] = p_int
    for k in range(m):
        pts_out.append(starts[k])
        pts_out.append(ends[k])
        pts_out.extend(arcs[k])
    out = np.asarray(pts_out, dtype=np.float64)
    if len(out) >= 2:  # drop consecutive duplicates
        dup = np.all(np.isclose(out, np.roll(out, 1, axis=0)), axis=1)
        out = out[~dup]
    return out if len(out) >= 3 else None


def buffer_polygon(packed: PackedPolygons, distance: float,
                   units: str = "degrees",
                   arc_step_deg: float = 12.0,
                   method: str = "planar") -> PackedPolygons:
    """true geometric outward buffer of every polygon (reference
    shape.py:200-266 `Shape.buffer`): shells grow by `distance`, holes
    shrink, with round joins at convex corners (arc sampled every
    `arc_step_deg`) and miter-trim joins at reflex corners — shapely's
    default round buffer shape. Thin concavities buffered by large
    distances can self-touch, as with any local offset method;
    downstream even-odd containment treats such slivers conservatively.

    method="planar" (default): offset directly in degree space
    (`meters` converts at the reference's 111 km/deg, shape.py:223-227).
    method="utm": the reference's metric round-trip (shape.py:240-255,
    to_crs UTM -> buffer -> back) — rings project to the UTM zone of
    the polygon-set centroid (functions/crs.py), offset in true meters,
    and project back; distance in `degrees` converts to meters first,
    mirroring the reference exactly.

    distance must be non-negative (reference raises too); units in
    {"degrees", "meters"}."""
    if distance < 0:
        raise ValueError("Distance must be non-negative.")
    if units not in ("degrees", "meters"):
        raise ValueError("Units must be one of:['degrees', 'meters']")
    if method not in ("planar", "utm"):
        raise ValueError("method must be one of:['planar', 'utm']")
    if method == "utm":
        d = distance * 111_000.0 if units == "degrees" else distance
    else:
        d = distance / 111_000.0 if units == "meters" else distance
    if d == 0:
        return packed
    if method == "utm":
        from . import crs
        la_min, la_max, lo_min, lo_max = packed.bounds()
        zone = crs.utm_zone((lo_min + lo_max) / 2.0)
        south = (la_min + la_max) / 2.0 < 0
    coords, rs, re_, rp, rh = [], [], [], [], []
    pos = 0
    step = math.radians(arc_step_deg)
    for r in range(len(packed.ring_start)):
        ring = packed.coords[packed.ring_start[r]:packed.ring_end[r]]
        is_hole = bool(packed.ring_hole[r])
        if method == "utm":
            e, nn = crs.to_utm(ring[:, 0], ring[:, 1], zone, south)
            ring = np.stack([nn, e], axis=1)  # (y=northing, x=easting)
        out = _offset_ring(ring, d, is_hole, step)
        if out is None:
            continue  # ring collapsed under the shrink
        if method == "utm":
            la, lo = crs.from_utm(out[:, 1], out[:, 0], zone, south)
            out = np.stack([la, lo], axis=1)
        coords.append(out)
        rs.append(pos)
        pos += len(out)
        re_.append(pos)
        rp.append(int(packed.ring_poly[r]))
        rh.append(is_hole)
    if not coords:
        raise ValueError("buffer collapsed every ring")
    return PackedPolygons(np.concatenate(coords), rs, re_, rp, rh,
                          list(packed.names))


def douglas_peucker(ring, tolerance):
    """iterative DP on a (K,2) open ring; returns simplified open ring."""
    ring = np.asarray(ring, dtype=np.float64)
    n = len(ring)
    if n < 4 or tolerance <= 0:
        return ring
    closed = np.vstack([ring, ring[:1]])
    keep = np.zeros(len(closed), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(closed) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = closed[a + 1:b]
        ay, ax = closed[a]
        by, bx = closed[b]
        dy, dx = by - ay, bx - ax
        L = math.hypot(dy, dx)
        if L == 0:
            d = np.hypot(seg[:, 0] - ay, seg[:, 1] - ax)
        else:
            d = np.abs(dy * (seg[:, 1] - ax) - dx * (seg[:, 0] - ay)) / L
        m = int(np.argmax(d))
        if d[m] > tolerance:
            keep[a + 1 + m] = True
            stack.append((a, a + 1 + m))
            stack.append((a + 1 + m, b))
    out = closed[keep][:-1]
    return out if len(out) >= 3 else ring
