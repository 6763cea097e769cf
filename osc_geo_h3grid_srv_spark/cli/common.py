"""shared CLI plumbing: engine/session construction + output shaping."""

from __future__ import annotations

import json


def add_common_args(parser):
    parser.add_argument("--verbose", action="store_true",
                        help="Enable verbose output")
    # accepted for drop-in parity with the reference client CLIs; the
    # engine runs in-process, there is no server to contact
    parser.add_argument("--host", required=False, help="ignored (no REST)")
    parser.add_argument("--port", required=False, help="ignored (no REST)")
    parser.add_argument("--database-dir", "--database_dir",
                        dest="database_dir", required=False,
                        help="engine warehouse directory")


def get_engine(database_dir, spark=None):
    from ..engine import GeoMeshEngine, make_spark
    if database_dir is None:
        raise SystemExit("Error: --database-dir is required for this verb")
    if spark is None:
        spark = make_spark(extra_conf={"spark.ui.enabled": "false"})
    return GeoMeshEngine(spark, database_dir)


def df_payload(df, limit=None):
    """DataFrame -> {"columns": [...], "data": [[...], ...]} (the
    reference's correlator/query wire shape)."""
    if limit is not None and limit >= 0:
        df = df.limit(limit)
    pdf = df.toPandas()
    return {"columns": pdf.columns.tolist(),
            "data": [[_plain(v) for v in row]
                     for row in pdf.itertuples(index=False, name=None)]}


def _plain(v):
    import numpy as np
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v if isinstance(v, (int, float, str, bool)) else str(v)


def jdump(obj):
    return json.dumps(obj, indent=2, ensure_ascii=False)


def load_polygons(path: str):
    """resolve a --shapefile argument: real .shp (sources/shapefile.py)
    or GeoJSON."""
    from ..functions import geo
    from ..sources.shapefile import packed_from_shapefile
    if path.lower().endswith(".shp"):
        return packed_from_shapefile(path)
    return geo.PackedPolygons.from_geojson(path)
