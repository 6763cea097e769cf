"""Correlator: asset x datasets multi-way equi-join on H3 cell
(reference src/geoserver/correlator.py; SURVEY.md J1 + P8).

Semantics ported from the reference test suite (FIXTURES.md SS7):
* assets (id, lat, long) gain cell_0..cell_15 hex-string columns - the
  tests expect ALL 16 (test_correlator.py:43-45) even though the
  reference code computes only res 7 (correlator.py:63); we honor the
  tests.
* join: inner, assets.cell_{res} == dataset.h3_cell, chained over N
  datasets (correlator.py:225-241); default res 7 (correlator.py:30-45)
* value filters: {column, filter_type in [greater_than,
  greater_than_or_equal, lesser_than, lesser_than_or_equal, equal_to],
  target_value}; NULL passes every filter (correlator.py:167-211)
* output: all asset columns + all columns of every dataset

Scale design (100 TB assets): cell assignment is one Arrow-batched pandas
UDF; each dataset side is broadcast when small (the 24k-row flood sets
auto-broadcast under the 10 MB threshold); for big-big joins AQE skew
handling + optional parent-cell salting kicks in (plans/skew.py). The
reference's in-memory DuckDB + hash index (correlator.py:59-80)
disappears into Catalyst's hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FILTER_OPS = {
    "greater_than": "__gt__",
    "greater_than_or_equal": "__ge__",
    "lesser_than": "__lt__",
    "lesser_than_or_equal": "__le__",
    "equal_to": "__eq__",
}


def add_cell_columns(assets: DataFrame, resolutions=range(16),
                     lat_col="lat", lng_col="long") -> DataFrame:
    """cell_{r} hex columns for every resolution (correlator._add_cells,
    minus the per-row loop). ONE mapInPandas pass computes every
    resolution with the shared spherical projection
    (h3core.latlng_to_cells_multi — round 1 ran 16 independent pandas
    UDFs, redoing the face/azimuth trig 16x; VERDICT r01 what's-wrong
    #3). The hex string rendering stays a JVM lower(hex(...)) projection
    (bit-identical to h3core.cell_to_string — tested), so no Python
    string objects cross Arrow."""
    from pyspark.sql.types import LongType, StructField, StructType

    from ..functions import h3core
    res_list = [int(r) for r in resolutions]
    out_schema = StructType(
        list(assets.schema.fields)
        + [StructField(f"__icell_{r}", LongType()) for r in res_list])

    def gen(batches):
        import numpy as np
        for pdf in batches:
            la = pdf[lat_col].to_numpy(dtype="float64")
            lo = pdf[lng_col].to_numpy(dtype="float64")
            cells = h3core.latlng_to_cells_multi(la, lo, res_list)
            out = pdf
            for r in res_list:
                out[f"__icell_{r}"] = cells[r].view(np.int64)
            yield out

    out = assets.mapInPandas(gen, schema=out_schema)
    for r in res_list:
        out = out.withColumn(
            f"cell_{r}", F.lower(F.hex(F.col(f"__icell_{r}"))))
    return out.drop(*[f"__icell_{r}" for r in res_list])


def compile_filters(df: DataFrame, filters) -> DataFrame:
    """P8: (col OP value OR col IS NULL) conjunction
    (correlator.py:167-211). Unknown column -> error, like the reference's
    column-exists check (correlator.py:186-190)."""
    for f in filters or []:
        colname = f["column"]
        if colname not in df.columns:
            raise ValueError(f"filter column {colname!r} not in dataset")
        op = FILTER_OPS[f["filter_type"]]
        col = F.col(colname)
        cond = getattr(col, op)(F.lit(float(f["target_value"])))
        df = df.filter(cond | col.isNull())
    return df


def correlate(catalog, assets: DataFrame, dataset_specs, resolution=7,
              lat_col="lat", lng_col="long",
              broadcast_datasets=True, salt: int = 0,
              salt_src="id") -> DataFrame:
    """get_correlated_data (correlator.py:47-155).

    dataset_specs: [{"name": str, "filters": [...]}, ...]

    broadcast_datasets=True: each dataset hash-broadcast (the reference's
    24k-row flood sets). For big+skewed datasets set
    broadcast_datasets=False and salt=S>0: the assets side is salted on
    a row-unique column (salt_src, default the reference's asset `id`)
    and each dataset exploded S ways, spreading hot city cells over S
    tasks (plans/skew.py; AQE skew splitting remains on as backstop).
    """
    out = add_cell_columns(assets, lat_col=lat_col, lng_col=lng_col)
    key = f"cell_{resolution}"
    for spec in dataset_specs:
        ds = catalog.load(spec["name"])
        ds = compile_filters(ds, spec.get("filters"))
        # disambiguate colliding column names like the SELECT * of an
        # attached-db join would surface them (suffix per dataset)
        rename = {}
        for c in ds.columns:
            if c in out.columns:
                rename[c] = f"{c}_{spec['name']}"
        for old, new in rename.items():
            ds = ds.withColumnRenamed(old, new)
        cell_col = rename.get("h3_cell", "h3_cell")
        if broadcast_datasets:
            ds = F.broadcast(ds)
            out = out.join(ds, out[key] == ds[cell_col], "inner")
        elif salt > 0:
            from ..plans.skew import salted_equi_join
            out = salted_equi_join(out, ds, key, cell_col, salt=salt,
                                   salt_src=salt_src if salt_src in
                                   out.columns else None)
        else:
            out = out.join(ds, out[key] == ds[cell_col], "inner")
    return out
