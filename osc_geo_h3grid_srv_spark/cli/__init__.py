"""CLI front-ends mirroring the reference's three CLIs
(src/cli/cli_geospatial.py, cli_shapefile.py, cli_repository.py) as thin
argparse layers over GeoMeshEngine — argparse -> engine -> JSON text.

Differences from the reference, by design:
* no REST hop: `--host/--port` are accepted and ignored; data verbs take
  `--database-dir` (the engine warehouse) directly.
* D6 fixed: `filter-assets --return-rows N` returns exactly N rows (the
  reference slices `[0:N+1]`).
* D9 reproduced: `filter --tolerance` is accepted and ignored, like the
  reference server path.
"""
