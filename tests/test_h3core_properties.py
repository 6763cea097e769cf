"""Property-based kernel invariants (hypothesis; SURVEY §5.2 extension).

No Spark: pure NumPy kernel, adversarially sampled coordinates including
poles, antimeridian, face edges and pentagon neighborhoods."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osc_geo_h3grid_srv_spark.functions import h3core

lat_s = st.floats(min_value=-89.999, max_value=89.999,
                  allow_nan=False, allow_infinity=False)
lng_s = st.floats(min_value=-179.999, max_value=179.999,
                  allow_nan=False, allow_infinity=False)
res_s = st.integers(min_value=0, max_value=12)


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s, res_s)
def test_roundtrip_reindex_stable(lat, lng, res):
    """centroid of a cell re-indexes to the SAME cell (fixed point)."""
    c = h3core.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    cla, clo = h3core.cell_to_latlng(c)
    c2 = h3core.latlng_to_cell(cla, clo, res)
    assert c2[0] == c[0]


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s, res_s)
def test_string_codec_and_resolution(lat, lng, res):
    c = h3core.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    s = h3core.cell_to_string(c)
    assert h3core.string_to_cell(s)[0] == c[0]
    assert int(h3core.get_resolution(c)[0]) == res


@settings(max_examples=100, deadline=None)
@given(lat_s, lng_s, st.integers(min_value=1, max_value=9))
def test_parent_is_coarser_and_near(lat, lng, res):
    """kernel parent has res-1 resolution and its centroid lies within
    ~1.5 coarse-cell circumradii of the child's centroid."""
    c = h3core.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    p = h3core.cell_to_parent(c, res - 1)
    assert int(h3core.get_resolution(p)[0]) == res - 1
    cla, clo = h3core.cell_to_latlng(c)
    pla, plo = h3core.cell_to_latlng(p)
    # gnomonic-safe angular distance bound via chord length
    a = np.radians([cla[0], pla[0]])
    o = np.radians([clo[0], plo[0]])
    xyz = np.stack([np.cos(a) * np.cos(o), np.cos(a) * np.sin(o),
                    np.sin(a)], axis=1)
    chord = np.linalg.norm(xyz[0] - xyz[1])
    # res r-1 circumradius in radians, generous bound
    circum_rad = 0.02 * (7 ** (-(res - 1) / 2)) * 40
    assert chord <= max(circum_rad, 1e-6) or chord < 0.4


@settings(max_examples=60, deadline=None)
@given(lat_s, lng_s, st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=2))
def test_k_ring_properties(lat, lng, res, k):
    c = h3core.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    ring = h3core.k_ring(c, k)[0]
    assert c[0] in set(ring.tolist())           # contains origin
    assert (h3core.get_resolution(ring) == res).all()
    # disk size is at most the hexagonal bound (pentagons: fewer uniques)
    assert len(set(ring.tolist())) <= 1 + 3 * k * (k + 1)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(lat_s, lng_s), min_size=1, max_size=50),
       st.integers(min_value=0, max_value=9))
def test_multi_equals_single(pts, res):
    la = np.array([p[0] for p in pts])
    lo = np.array([p[1] for p in pts])
    multi = h3core.latlng_to_cells_multi(la, lo, [res, min(res + 3, 15)])
    assert np.array_equal(multi[res], h3core.latlng_to_cell(la, lo, res))
