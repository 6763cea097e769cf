"""H3 compact/uncompact: kernel properties + distributed parity
(functions/h3core.py compact_cells / operators/h3compact.py)."""

import numpy as np
import pandas as pd

from osc_geo_h3grid_srv_spark.functions import h3core as h3
from osc_geo_h3grid_srv_spark.operators.h3compact import (
    compact_cells_df, uncompact_cells_df)


def _disk_cells(lat, lng, res, k=2):
    c = h3.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    return np.unique(h3.k_ring(c, k))


def test_kernel_roundtrip_and_minimality():
    rs = np.random.RandomState(4)
    for lat, lng in [(52.5, 13.4), (-33.9, 151.2), (0.1, -78.5),
                     (64.1, -21.9)]:
        kids = h3.cell_to_children(
            h3.latlng_to_cell(np.array([lat]), np.array([lng]), 4), 6)
        # full region compacts to the single ancestor and back
        comp = h3.compact_cells(kids)
        assert len(comp) == 1
        assert set(h3.uncompact_cells(comp, 6).tolist()) \
            == set(kids.tolist())
        # random holes: round trip preserves the set exactly and no
        # complete sibling group survives compaction
        holes = kids[rs.rand(len(kids)) > 0.15]
        c2 = h3.compact_cells(holes)
        assert set(h3.uncompact_cells(c2, 6).tolist()) \
            == set(holes.tolist())
        res = h3.get_resolution(c2)
        for r in range(6, 0, -1):
            at_r = c2[res == r]
            if len(at_r) == 0:
                continue
            par = h3.cell_to_parent(at_r, r - 1)
            u, n = np.unique(par, return_counts=True)
            need = np.where(h3.is_pentagon(u), 6, 7)
            assert (n < need).all()  # minimality


def test_kernel_pentagon_children_and_compact():
    for res in (0, 1, 2):
        pents = h3.pentagon_cells(res)
        assert len(pents) == 12
        assert h3.is_pentagon(pents).all()
        kids = h3.cell_to_children(pents[:1], res + 2)
        # pentagon subtree: 6 children at +1, 6*7 at +2... minus the
        # nested pentagon's own deleted digit: 6 + 6*7 = 42? the +2
        # level has 6*7 cells of which the center chain again drops
        # one digit -> 41
        assert len(kids) == 41
        comp = h3.compact_cells(kids)
        assert len(comp) == 1 and comp[0] == pents[0]


def test_kernel_mixed_resolution_input():
    a = h3.latlng_to_cell(np.array([10.0]), np.array([20.0]), 3)
    kids5 = h3.cell_to_children(a, 5)
    sibs4 = h3.cell_to_children(a, 4)
    mixed = np.concatenate([kids5[:7], sibs4[1:]])  # overlap-free mix
    comp = h3.compact_cells(np.concatenate(
        [h3.cell_to_children(kids5[:1], 6),  # one full res-6 group...
         mixed[7:]]))
    # expansion to res 6 matches expanding the input to res 6
    want = np.unique(h3.cell_to_children(
        np.concatenate([kids5[:1], mixed[7:]]), 6))
    got = h3.uncompact_cells(comp, 6)
    assert set(got.tolist()) == set(want.tolist())


def test_distributed_matches_kernel(spark):
    rs = np.random.RandomState(7)
    kids = h3.cell_to_children(
        h3.latlng_to_cell(np.array([48.9]), np.array([2.3]), 4), 6)
    pent_kids = h3.cell_to_children(h3.pentagon_cells(2)[:2], 4)
    cells = np.unique(np.concatenate([
        kids[rs.rand(len(kids)) > 0.1], pent_kids]))
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cells.astype(np.int64)}))
    got = np.sort(np.array(
        [r["cell"] for r in compact_cells_df(df).collect()],
        dtype=np.int64).view(np.uint64))
    want = np.sort(h3.compact_cells(cells))
    assert got.tolist() == want.tolist()
    # distributed uncompact back to the finest res restores the set
    # (mixed-res compact output -> res 6 everywhere != input when
    # pent_kids are res 4, so expand the kernel way too)
    back = np.sort(np.array(
        [r["cell"] for r in
         uncompact_cells_df(compact_cells_df(df), 6).collect()],
        dtype=np.int64).view(np.uint64))
    assert back.tolist() == np.sort(
        h3.uncompact_cells(cells, 6)).tolist()
