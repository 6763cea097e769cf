"""geospatial CLI (reference src/cli/cli_geospatial.py:526-581): verbs
initialize / addmeta / showmeta / show / filter / filter-assets over
GeoMeshEngine. `execute(argv)` returns the output string (and prints
it), like the reference's `execute` — the integration tests assert on
substrings of the return value.

Reference defaults honored: `show --type h3`, radius datasets default
resolution 3 via the engine (queries.py `_radius_guard`), shapefile
retrieval resolution 7; `--tolerance` ignored (defect D9), and
`--return-rows` returns exactly N rows (defect D6 fixed)."""

from __future__ import annotations

import argparse
import json
import os

from .common import (add_common_args, df_payload, get_engine, jdump,
                     load_polygons)


def _show(engine, args):
    tkw = {"year": args.year, "month": args.month, "day": args.day}
    if args.cell:
        if args.radius is not None:
            df = engine.cell_radius(args.dataset, args.cell, args.radius,
                                    **tkw)
        else:
            df = engine.cell_point(args.dataset, args.cell, **tkw)
    elif args.shapefile:
        pp = load_polygons(args.shapefile)
        df = engine.shapefile_get(args.dataset, pp, region=args.region,
                                  resolution=args.resolution or 7, **tkw)
    elif args.latitude is not None and args.longitude is not None:
        if args.radius is not None:
            df = engine.radius(args.dataset, args.latitude, args.longitude,
                               args.radius, resolution=args.resolution or 3,
                               **tkw)
        else:
            df = engine.latlong_point(args.dataset, args.latitude,
                                      args.longitude,
                                      resolution=args.resolution or 7,
                                      **tkw)
    else:
        raise SystemExit(
            "Error: Missing 'cell | latitude | longitude | shapefile' "
            "parameter")
    return jdump(df_payload(df))


def _filter(engine, args):
    # reference `filter`: shapefile -> H3 land cells; tolerance is
    # accepted and ignored (defect D9, geomesh_router.py /filter path)
    pp = load_polygons(args.shapefile)
    df = engine.filter_cells(pp, resolution=int(args.resolution or 0),
                             tolerance=args.tolerance)
    cells = [r["cell"] for r in df.select("cell").collect()]
    return jdump(cells)


def _filter_assets(engine, args):
    assets = engine.spark.read.parquet(args.asset_file)
    with open(args.dataset_file) as fh:
        specs = json.load(fh)
    out = engine.correlate(assets, specs)
    n = int(args.return_rows)
    payload = df_payload(out, limit=None if n < 0 else n)
    num_rows_str = "all" if n < 0 else f"{n}"
    return ("columns: " + json.dumps(payload["columns"], ensure_ascii=False)
            + "\n\n"
            + f"data (showing {num_rows_str} rows):"
            + json.dumps(payload["data"], ensure_ascii=False))


def _addmeta(engine, args):
    engine.catalog.add_meta(
        args.dataset_name, args.description,
        json.loads(args.key_columns), json.loads(args.value_columns),
        args.dataset_type)
    return f"Created Metadata Entry for {args.dataset_name}"


def _initialize(args):
    # reference cliexec.initialize: create the database dir, False if it
    # already exists (cliexec_geospatial.py:40-55)
    if args.database_dir is None:  # same message as common.get_engine
        raise SystemExit("Error: --database-dir is required for this verb")
    if os.path.exists(args.database_dir):
        return jdump(False)
    os.makedirs(args.database_dir)
    return jdump(True)


def build_parser():
    parser = argparse.ArgumentParser(prog="geospatial",
                                     description="Geospatial data mesh CLI")
    add_common_args(parser)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("initialize", help="create the warehouse directory")
    p.add_argument("--stations_path", required=False)
    p.add_argument("--temperatures_path", required=False)

    p = sub.add_parser("addmeta", help="Add a metadata entry")
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--description", required=True)
    p.add_argument("--value_columns", required=True,
                   help="JSON {column: type}")
    p.add_argument("--key_columns", required=True, help="JSON {column: type}")
    p.add_argument("--dataset_type", required=True, help="[h3, point]")

    sub.add_parser("showmeta", help="show available meta entries")

    p = sub.add_parser("show", help="Show geospatial data")
    p.add_argument("--dataset", required=True)
    p.add_argument("--cell")
    p.add_argument("--shapefile")
    p.add_argument("--latitude", type=float)
    p.add_argument("--longitude", type=float)
    p.add_argument("--region", default=None)
    p.add_argument("--radius", type=float)
    p.add_argument("--resolution", type=int)
    p.add_argument("--year", type=int)
    p.add_argument("--month", type=int)
    p.add_argument("--day", type=int)
    p.add_argument("--type", default="h3")

    p = sub.add_parser("filter", help="Shapefile -> H3 cells")
    p.add_argument("--shapefile", required=True)
    p.add_argument("--resolution", default=0)
    p.add_argument("--tolerance", default=0.1)

    p = sub.add_parser("filter-assets",
                       help="Correlate assets against datasets")
    p.add_argument("--asset-file", required=True)
    p.add_argument("--dataset-file", required=True)
    p.add_argument("--return-rows", type=int, default=2)
    return parser


def execute(xargs=None, spark=None) -> str:
    args = build_parser().parse_args(xargs)
    if args.command == "initialize":
        out = _initialize(args)
    else:
        engine = get_engine(args.database_dir, spark=spark)
        if args.command == "showmeta":
            out = jdump(df_payload(engine.show_meta()))
        elif args.command == "addmeta":
            out = _addmeta(engine, args)
        elif args.command == "show":
            out = _show(engine, args)
        elif args.command == "filter":
            out = _filter(engine, args)
        elif args.command == "filter-assets":
            out = _filter_assets(engine, args)
        else:  # pragma: no cover
            raise SystemExit(f"unknown command {args.command}")
    print(out)
    return out


if __name__ == "__main__":
    execute()
