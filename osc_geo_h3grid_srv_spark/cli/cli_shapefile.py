"""shapefile CLI (reference src/cli/cli_shapefile.py:44-104): verbs
transform / statistics / simplify / buffer / view over the engine's
geometry kernels + the minimal ESRI shapefile I/O. No Spark session
needed — these are pure geometry verbs.

Reference deviations, documented:
* transform: the engine is EPSG:4326-only (SURVEY.md F11 decision), so
  transform validates/loads and reports statistics with the fixed CRS —
  a no-op reprojection, like the reference when already 4326.
* view: writes a dependency-free self-contained SVG/HTML page instead of
  a folium/leaflet map (the reference's folium path is defect D3).
"""

from __future__ import annotations

import argparse

import numpy as np

from .common import add_common_args, jdump, load_polygons


def _statistics(pp):
    """the reference's statistics dict (shape.py:92-155) from
    PackedPolygons via geo.polygon_stats."""
    from ..functions import geo
    per = geo.polygon_stats(pp)
    n = len(per)
    holes_total = int(np.asarray(pp.ring_hole).sum())

    def mean(key):
        return sum(p[key] for p in per) / n if n else 0.0

    la_min, la_max, lo_min, lo_max = pp.bounds()
    return {
        "coordinate_system": "EPSG:4326",
        "count_polygons": n,
        "count_vertices": int(sum(p["num_vertices"] for p in per)),
        "mean_num_vertices": mean("num_vertices"),
        "mean_area": mean("area"),
        "mean_perimeter": mean("perimeter"),
        "mean_area_perimeter_ratio": mean("area_perimeter_ratio"),
        "mean_shape_index": mean("shape_index"),
        "mean_num_holes": holes_total / n if n else 0.0,
        "number_of_features": n,
        "geometry_types": ["Polygon"],
        "geometry_type_counts": {"Polygon": n},
        # total_bounds is geopandas order (minx, miny, maxx, maxy)
        "total_bounds": [lo_min, la_min, lo_max, la_max],
        "attributes": ["name", "geometry"],
        "attribute_stats": {
            "name": {"unique_values": len(set(pp.names)),
                     "value_counts": {nm: pp.names.count(nm)
                                      for nm in pp.names}}},
    }


def _rings_by_record(pp):
    """PackedPolygons -> write_shapefile record structure."""
    recs = [[] for _ in range(pp.n_polys)]
    for r in range(len(pp.ring_start)):
        ring = pp.coords[pp.ring_start[r]:pp.ring_end[r]]
        recs[int(pp.ring_poly[r])].append((ring, bool(pp.ring_hole[r])))
    return recs


def _save(pp, path):
    from ..sources.shapefile import write_shapefile
    base = path[:-4] if path.lower().endswith(".shp") else path
    write_shapefile(_rings_by_record(pp), base, names=pp.names)
    return base + ".shp"


def _simplify(args):
    from ..functions import geo
    tol = float(args.tolerance)
    if tol < 0:
        raise SystemExit("Error: Tolerance must be non-negative.")
    pp = load_polygons(args.shapefile)
    polys, names = [], []
    for p in range(pp.n_polys):
        rings = []
        for r in range(len(pp.ring_start)):
            if int(pp.ring_poly[r]) != p:
                continue
            ring = pp.coords[pp.ring_start[r]:pp.ring_end[r]]
            rings.append(geo.douglas_peucker(ring, tol))
        polys.append(rings)
        names.append(pp.names[p])
    simplified = geo.PackedPolygons.from_latlng_rings(polys, names)
    if args.path:
        _save(simplified, args.path)
    return _statistics(simplified)


def _buffer(args):
    # method="utm" mirrors the reference's metric round-trip
    # (shape.py:240-255): project to the UTM zone, buffer in meters,
    # project back
    from ..functions import geo
    pp = load_polygons(args.shapefile)
    try:
        buffered = geo.buffer_polygon(pp, float(args.distance), args.units,
                                      method="utm")
    except ValueError as e:
        raise SystemExit(f"Error: {e}")
    if args.path:
        _save(buffered, args.path)
    return _statistics(buffered)


def _view(args):
    """self-contained SVG map of the polygons -> HTML file."""
    pp = load_polygons(args.shapefile)
    la_min, la_max, lo_min, lo_max = pp.bounds()
    pad = max(la_max - la_min, lo_max - lo_min, 1e-6) * 0.05
    la_min -= pad; la_max += pad; lo_min -= pad; lo_max += pad
    W = 800
    H = max(int(W * (la_max - la_min) / (lo_max - lo_min)), 40)

    def xy(lat, lng):
        x = (lng - lo_min) / (lo_max - lo_min) * W
        y = (la_max - lat) / (la_max - la_min) * H
        return f"{x:.2f},{y:.2f}"

    paths = []
    for p in range(pp.n_polys):
        d = []
        for r in range(len(pp.ring_start)):
            if int(pp.ring_poly[r]) != p:
                continue
            ring = pp.coords[pp.ring_start[r]:pp.ring_end[r]]
            d.append("M" + " L".join(xy(y, x) for y, x in ring) + " Z")
        paths.append(
            f'<path d="{" ".join(d)}" fill="#4c78a8" fill-opacity="0.35" '
            f'fill-rule="evenodd" stroke="#27436b" stroke-width="1">'
            f"<title>{pp.names[p]}</title></path>")
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{args.shapefile}</title></head><body>"
        f"<svg viewBox='0 0 {W} {H}' width='{W}' height='{H}' "
        "xmlns='http://www.w3.org/2000/svg'>"
        + "".join(paths) + "</svg></body></html>")
    with open(args.path, "w") as fh:
        fh.write(html)
    return {"status": "successful", "path": args.path,
            "polygons": pp.n_polys}


def build_parser():
    parser = argparse.ArgumentParser(prog="shapefile",
                                     description="Shapefile utilities CLI")
    add_common_args(parser)
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("transform", help="reproject to EPSG:4326")
    p.add_argument("--shapefile", required=True)
    p = sub.add_parser("statistics", help="shapefile statistics")
    p.add_argument("--shapefile", required=True)
    p = sub.add_parser("simplify", help="Douglas-Peucker simplification")
    p.add_argument("--shapefile", required=True)
    p.add_argument("--tolerance", required=True, type=float)
    p.add_argument("--path", required=False,
                   help="where to write the simplified .shp")
    p = sub.add_parser("buffer", help="geometric buffer")
    p.add_argument("--shapefile", required=True)
    p.add_argument("--distance", required=True, type=float)
    p.add_argument("--units", required=True,
                   help="one of [degrees, meters]")
    p.add_argument("--path", required=False,
                   help="where to write the buffered .shp")
    p = sub.add_parser("view", help="render polygons to an HTML/SVG map")
    p.add_argument("--shapefile", required=True)
    p.add_argument("--path", required=True)
    return parser


def execute(xargs=None) -> str:
    args = build_parser().parse_args(xargs)
    if args.command in ("transform", "statistics"):
        out = jdump(_statistics(load_polygons(args.shapefile)))
    elif args.command == "simplify":
        out = jdump(_simplify(args))
    elif args.command == "buffer":
        out = jdump(_buffer(args))
    elif args.command == "view":
        out = jdump(_view(args))
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {args.command}")
    print(out)
    return out


if __name__ == "__main__":
    execute()
