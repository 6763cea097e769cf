"""Kernel golden + invariant tests (SURVEY.md SS5.2 items 1 and 5).

Golden vectors were extracted verbatim from the reference's shipped
example databases (examples/common/example_datasets/*.duckdb):
jamaica_buildings carries true H3 cells for 15 points at res 0-13;
the two flood datasets carry ~50k res-7 cells with stored centroids.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from osc_geo_h3grid_srv_spark.functions import h3core as h

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def jamaica():
    return json.load(open(os.path.join(FIX, "jamaica_golden.json")))


def test_jamaica_golden_all_resolutions(jamaica):
    lat = np.array([r["latitude"] for r in jamaica])
    lng = np.array([r["longitude"] for r in jamaica])
    for res in range(14):
        got = h.cell_to_string(h.latlng_to_cell(lat, lng, res))
        want = [r[f"res{res}"] for r in jamaica]
        assert list(got) == want, f"res {res}"


def test_parent_equals_reassigned_centroid_gap1():
    # parent(c, res-1) == latlng_to_cell(centroid(c), res-1): immediate
    # children sit strictly inside their parent. (Larger gaps legitimately
    # diverge for a few % of cells - H3's aperture-7 subdivision is not
    # nested - so only the gap-1 invariant is exact.)
    rng = np.random.default_rng(5)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 50000)))
    lng = rng.uniform(-180, 180, 50000)
    for res in [3, 6, 9]:
        c = h.latlng_to_cell(lat, lng, res)
        la, lo = h.cell_to_latlng(c)
        assert (h.cell_to_parent(c, res - 1)
                == h.latlng_to_cell(la, lo, res - 1)).all()


@pytest.mark.parametrize("sfx", ["0010y", "1000y"])
def test_flood_golden_centroids_and_roundtrip(sfx):
    df = pd.read_parquet(os.path.join(FIX, f"flood_{sfx}.parquet"))
    ids = h.string_to_cell(df["h3_cell"].values)
    assert (h.get_resolution(ids) == 7).all()
    clat, clng = h.cell_to_latlng(ids)
    # centroids stored as REAL (float32) in the reference database
    assert np.abs(clat - df["latitude"].values).max() < 1e-5
    assert np.abs(clng - df["longitude"].values).max() < 1e-5
    assert (h.latlng_to_cell(clat, clng, 7) == ids).all()


def test_global_cell_counts():
    rng = np.random.default_rng(42)
    n = 1_500_000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    for res in [0, 1, 2]:
        got = len(np.unique(h.latlng_to_cell(lat, lng, res)))
        assert got == h.CELLS_AT_RESOLUTION[res]


@pytest.mark.parametrize("res", [1, 2, 5, 9, 15])
def test_global_roundtrip(res):
    rng = np.random.default_rng(res)
    n = 150_000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    cells = np.unique(h.latlng_to_cell(lat, lng, res))
    la, lo = h.cell_to_latlng(cells)
    assert (h.latlng_to_cell(la, lo, res) == cells).all()


def test_pentagon_detection():
    # all 12 pentagons at res 0; their res-1 pentagon children too
    bc = h.PENTAGON_BASE_CELLS.astype(np.uint64)
    digits = np.zeros((12, 15), dtype=np.int8)
    p0 = h._pack(0, bc, digits)
    assert h.is_pentagon(p0).all()
    p1 = h._pack(1, bc, digits)
    assert h.is_pentagon(p1).all()
    digits2 = digits.copy()
    digits2[:, 0] = 2
    assert not h.is_pentagon(h._pack(1, bc, digits2)).any()


def test_string_roundtrip():
    rng = np.random.default_rng(0)
    lat = rng.uniform(-85, 85, 1000)
    lng = rng.uniform(-180, 180, 1000)
    c = h.latlng_to_cell(lat, lng, 9)
    s = h.cell_to_string(c)
    assert (h.string_to_cell(s) == c).all()
    assert all(len(x) == 15 for x in s)


def test_deterministic_across_batch_orders():
    # same points in different orders / batch sizes yield identical cells
    rng = np.random.default_rng(3)
    lat = rng.uniform(-85, 85, 10000)
    lng = rng.uniform(-180, 180, 10000)
    a = h.latlng_to_cell(lat, lng, 9)
    perm = rng.permutation(10000)
    b = np.empty_like(a)
    for chunk in np.array_split(perm, 7):
        b[chunk] = h.latlng_to_cell(lat[chunk], lng[chunk], 9)
    assert (a == b).all()
