"""From-scratch vectorized H3 kernel in pure NumPy.

This is a clean-room reimplementation of Uber's public H3 grid system
(aperture-7 hexagonal grid on a gnomonic-projected icosahedron; the
algorithm and the small orientation constants are published, Apache-2.0).
The reference repo (os-climate/osc-geo-h3grid-srv) consumes H3 via the
`h3` C library (requirements.txt:5 pins h3==3.7.6); that library is not
installable in this environment, so the grid math lives here, fully
vectorized over NumPy arrays (the hot path demanded by BASELINE.json:
"no per-row Python").

Design notes
------------
* Only two small constant tables are embedded (20 icosahedron face
  centers + 20x3 face axis azimuths). Everything else - the 122-entry
  base-cell table, the 540-entry (face,i,j,k)->base-cell lookup, the
  face-neighbor/overage transforms - is DERIVED geometrically at import
  time and cross-validated against golden vectors extracted from the
  reference's example databases (tests/fixtures/jamaica_golden.json:
  15 points with true cells at res 0-13; tests/fixtures/flood_*.parquet:
  ~50k res-7 cells with stored centroids). See tests/test_h3core.py.
* Base-cell numbering was verified to be the H3 numbering: sorting the
  122 derived cell centers by (latitude desc, longitude asc) reproduces
  the published pentagon list [4,14,24,38,49,58,63,72,83,97,107,117]
  and the golden base cells (Jamaica=51, Germany=15).
* All public functions accept and return NumPy arrays and are
  vectorized; no per-row Python anywhere.

Reference parity citations: cell assignment replaces per-row
h3.geo_to_h3 (reference src/geoserver/correlator.py:90-93,
src/geoserver/geomesh.py:896); centroid lookup replaces h3.h3_to_geo
(geomesh.py:1301-1316); resolution/parent/k_ring/polyfill per
SURVEY.md SS2.6 F1-F6.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Published H3 orientation constants (icosahedron face centers, lat/lng rad)
# ---------------------------------------------------------------------------

FACE_CENTER_GEO = np.array([
    [0.803582649718989942, 1.248397419617396099],
    [1.307747883455638156, 2.536945009877921159],
    [1.054751253523952054, -1.347517358900396623],
    [0.600191595538186799, -0.450603909469755746],
    [0.491715428198773866, 0.401988202911306943],
    [0.172745327415618701, 1.678146885280433686],
    [0.605929321571350690, 2.953923329812411617],
    [0.427370518328979641, -1.888876200336285401],
    [-0.079066118549212831, -0.733429513380867741],
    [-0.230961644455383637, 0.506495587332349035],
    [0.079066118549212831, 2.408163140208925497],
    [0.230961644455383637, -2.635097066257444203],
    [-0.172745327415618701, -1.463445768309359553],
    [-0.605929321571350690, -0.187669323777381622],
    [-0.427370518328979641, 1.252716453253507838],
    [-0.600191595538186799, 2.690988744120037492],
    [-0.491715428198773866, -2.739604450678486295],
    [-0.803582649718989942, -1.893195233972397139],
    [-1.307747883455638156, -0.604647643711872080],
    [-1.054751253523952054, 1.794075294689396615],
])

# azimuth (rad) from each face center to its vertices 0/1/2 = the ccw i/j/k
# axes of the face's Class II hex grid
FACE_AXES_AZ_RADS_CII = np.array([
    [5.619958268523939882, 3.525563166130744542, 1.431168063737548730],
    [5.760339081714187279, 3.665943979320991689, 1.571548876927796127],
    [0.780213654393430055, 4.969003859179821079, 2.874608756786625655],
    [0.430469363979999913, 4.619259568766391033, 2.524864466373195467],
    [6.130269123335111400, 4.035874020941915804, 1.941478918548720291],
    [2.692877706530642877, 0.598482604137447119, 4.787272808923838195],
    [2.982963003477243874, 0.888567901084048369, 5.077358105870439581],
    [3.532912002790141181, 1.438516900396945656, 5.627307105183336758],
    [3.494305004259568154, 1.399909901866372864, 5.588700106652763840],
    [3.003214169499538391, 0.908819067106342928, 5.097609271892733906],
    [5.930472956509811562, 3.836077854116615875, 1.741682751723420374],
    [0.138378484090254847, 4.327168688876645809, 2.232773586483450311],
    [0.448714947059150361, 4.637505151845541521, 2.543110049452346023],
    [0.158629650112549365, 4.347419854898940135, 2.253024752505744637],
    [5.891865957979238535, 3.797470855586042958, 1.703075753192847583],
    [2.711123289609793325, 0.616728187216597771, 4.805518392002988683],
    [3.294508837434268316, 1.200113735041072948, 5.388903939827463911],
    [3.804819692245439833, 1.710424589852244509, 5.899214794638635504],
    [3.664438879055192436, 1.570043776661997111, 5.758833981448388106],
    [2.361378999196363184, 0.266983896803167583, 4.455774101589558636],
])

M_SQRT7 = math.sqrt(7.0)
M_SIN60 = math.sin(math.pi / 3.0)
M_AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))
RES0_U_GNOMONIC = 0.38196601125010500003
MAX_H3_RES = 15

# digits: 0=center 1=K 2=J 3=JK 4=I 5=IK 6=IJ
_UNIT_VECS = np.array([
    [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
    [1, 0, 0], [1, 0, 1], [1, 1, 0],
], dtype=np.int64)

# digit rotation lookup: _ROT_CCW[d] = digit of direction rotated 60deg ccw
_ROT_CCW = np.array([0, 5, 3, 1, 6, 4, 2], dtype=np.int8)
_ROT_CW = np.array([0, 3, 6, 2, 5, 1, 4], dtype=np.int8)

# precomputed iterated rotations: _ROT_CCW_N[n, d]
_ROT_CCW_N = np.zeros((6, 7), dtype=np.int8)
_ROT_CCW_N[0] = np.arange(7)
for _n in range(1, 6):
    _ROT_CCW_N[_n] = _ROT_CCW[_ROT_CCW_N[_n - 1]]

_PENT_LIST = [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]

# pentagon forward conventions: (base cell, face) -> (ccwRot60, is_cw_offset).
# Derived by the self-consistency fit in _h3_pentfit.py (the inverse
# direction is fully determined by the home FaceIJK + published overage
# algorithm and was validated geometrically; these are the unique values
# under which latlng_to_cell inverts cell_to_latlng for every pentagon
# descendant). Spot-matches the published H3 table where recalled
# (bc4: rots 0-4 / no cw offsets; bc14: cw-offset faces {2,6}).
_PENT_SLOT_FIT = {
    (4, 0): (0, 0), (4, 1): (1, 0), (4, 2): (2, 0), (4, 3): (3, 0),
    (4, 4): (4, 0),
    (14, 1): (0, 0), (14, 2): (1, 1), (14, 6): (3, 1), (14, 7): (3, 0),
    (14, 11): (0, 0),
    (24, 0): (0, 0), (24, 1): (1, 1), (24, 5): (3, 1), (24, 6): (3, 0),
    (24, 10): (0, 0),
    (38, 2): (0, 0), (38, 3): (1, 1), (38, 7): (3, 1), (38, 8): (3, 0),
    (38, 12): (0, 0),
    (49, 0): (1, 1), (49, 4): (0, 0), (49, 5): (3, 0), (49, 9): (3, 1),
    (49, 14): (0, 0),
    (58, 3): (0, 0), (58, 4): (1, 1), (58, 8): (3, 1), (58, 9): (3, 0),
    (58, 13): (0, 0),
    (63, 6): (0, 0), (63, 10): (3, 0), (63, 11): (3, 1), (63, 15): (1, 1),
    (63, 16): (0, 0),
    (72, 7): (0, 0), (72, 11): (3, 0), (72, 12): (3, 1), (72, 16): (1, 1),
    (72, 17): (0, 0),
    (83, 5): (0, 0), (83, 10): (3, 1), (83, 14): (3, 0), (83, 15): (0, 0),
    (83, 19): (1, 1),
    (97, 8): (0, 0), (97, 12): (3, 0), (97, 13): (3, 1), (97, 17): (1, 1),
    (97, 18): (0, 0),
    (107, 9): (0, 0), (107, 13): (3, 0), (107, 14): (3, 1), (107, 18): (1, 1),
    (107, 19): (0, 0),
    (117, 15): (0, 0), (117, 16): (4, 0), (117, 17): (3, 0), (117, 18): (2, 0),
    (117, 19): (1, 0),
}


# ---------------------------------------------------------------------------
# Spherical / vector helpers (all vectorized)
# ---------------------------------------------------------------------------

def _geo_to_xyz(lat, lng):
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


FACE_CENTER_XYZ = _geo_to_xyz(FACE_CENTER_GEO[:, 0], FACE_CENTER_GEO[:, 1])


def _geo_azimuth(lat1, lng1, lat2, lng2):
    return np.arctan2(
        np.cos(lat2) * np.sin(lng2 - lng1),
        np.cos(lat1) * np.sin(lat2)
        - np.sin(lat1) * np.cos(lat2) * np.cos(lng2 - lng1),
    )


def _closest_face(xyz):
    # .dot dispatches to BLAS gemm; the @ operator takes a ~35x slower
    # inner-loop path for this (N,3)x(3,20) shape. Result identical.
    return xyz.dot(FACE_CENTER_XYZ.T).argmax(axis=-1)


def _geo_to_hex2d(lat, lng, res, face=None):
    """(lat,lng) rad -> (face, x, y) in the face-local hex plane scaled to
    resolution `res` (gnomonic projection + Class III rotation for odd res).
    """
    xyz = _geo_to_xyz(lat, lng)
    if face is None:
        face = _closest_face(xyz)
    fclat = FACE_CENTER_GEO[face, 0]
    fclng = FACE_CENTER_GEO[face, 1]
    dot = np.clip((xyz * FACE_CENTER_XYZ[face]).sum(axis=-1), -1.0, 1.0)
    r = np.arccos(dot)
    az = _geo_azimuth(fclat, fclng, lat, lng)
    theta = np.mod(
        FACE_AXES_AZ_RADS_CII[face, 0] - np.mod(az, 2 * math.pi), 2 * math.pi
    )
    if res % 2 == 1:
        theta = np.mod(theta - M_AP7_ROT_RADS, 2 * math.pi)
    rg = np.tan(r) / RES0_U_GNOMONIC * (M_SQRT7 ** res)
    x = np.where(r < 1e-16, 0.0, rg * np.cos(theta))
    y = np.where(r < 1e-16, 0.0, rg * np.sin(theta))
    return face, x, y


def _hex2d_to_geo(face, x, y, res):
    """inverse of _geo_to_hex2d (spherical direct geodesic)."""
    r = np.sqrt(x * x + y * y)
    theta = np.arctan2(y, x)
    rr = np.arctan(r / (M_SQRT7 ** res) * RES0_U_GNOMONIC)
    if res % 2 == 1:
        theta = theta + M_AP7_ROT_RADS
    az = np.mod(FACE_AXES_AZ_RADS_CII[face, 0] - theta, 2 * math.pi)
    fclat = FACE_CENTER_GEO[face, 0]
    fclng = FACE_CENTER_GEO[face, 1]
    sl = np.sin(fclat) * np.cos(rr) + np.cos(fclat) * np.sin(rr) * np.cos(az)
    lat = np.arcsin(np.clip(sl, -1.0, 1.0))
    lng = fclng + np.arctan2(
        np.sin(az) * np.sin(rr) * np.cos(fclat),
        np.cos(rr) - np.sin(fclat) * np.sin(lat),
    )
    zero = rr < 1e-16
    lat = np.where(zero, fclat, lat)
    lng = np.where(zero, fclng, lng)
    lng = np.mod(lng + math.pi, 2 * math.pi) - math.pi
    return lat, lng


# ---------------------------------------------------------------------------
# IJK lattice primitives (vectorized; published H3 algorithms)
# ---------------------------------------------------------------------------

def _ijk_normalize(i, j, k):
    # the published normalize (fold each negative axis, then subtract the
    # min) is a sequence of uniform subtractions ending with min == 0 --
    # algebraically identical to subtracting min(i,j,k) once
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    k = np.asarray(k, dtype=np.int64)
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _ijk_to_hex2d(i, j, k):
    i = np.asarray(i, dtype=np.float64)
    j = np.asarray(j, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    return (i - k) - 0.5 * (j - k), (j - k) * M_SIN60


def _hex2d_to_ijk(x, y):
    """exact hex-grid rounding (_hex2dToCoordIJK), vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    i = np.empty_like(m1)
    j = np.empty_like(m1)

    b1 = r1 < 0.5
    b1a = b1 & (r1 < 1.0 / 3.0)
    c = r2 < (1.0 + r1) / 2.0
    i = np.where(b1a, m1, i)
    j = np.where(b1a, np.where(c, m2, m2 + 1), j)

    b1b = b1 & ~(r1 < 1.0 / 3.0)
    j = np.where(b1b, np.where(r2 < (1.0 - r1), m2, m2 + 1), j)
    c = ((1.0 - r1) <= r2) & (r2 < (2.0 * r1))
    i = np.where(b1b, np.where(c, m1 + 1, m1), i)

    b2 = ~b1
    b2a = b2 & (r1 < 2.0 / 3.0)
    j = np.where(b2a, np.where(r2 < (1.0 - r1), m2, m2 + 1), j)
    c = ((2.0 * r1 - 1.0) < r2) & (r2 < (1.0 - r1))
    i = np.where(b2a, np.where(c, m1, m1 + 1), i)

    b2b = b2 & ~(r1 < 2.0 / 3.0)
    i = np.where(b2b, m1 + 1, i)
    j = np.where(b2b, np.where(r2 < (r1 / 2.0), m2, m2 + 1), j)

    # fold across the axes if necessary
    neg_x = x < 0.0
    even_j = (j % 2) == 0
    axisi = np.where(even_j, j // 2, (j + 1) // 2)
    diff = i - axisi
    i = np.where(neg_x, np.where(even_j, i - 2 * diff, i - (2 * diff + 1)), i)
    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)
    return _ijk_normalize(i, j, k=np.zeros_like(i))


def _lround_div7(n):
    """lround(n / 7.0) for integer arrays; exact .5 cannot occur, so
    nearest-int == floor((n+3)/7) in pure integer math (no float trip)."""
    return (n + 3) // 7


def _up_ap7(i, j, k):  # ccw (into Class III parent)
    di = i - k
    dj = j - k
    ni = _lround_div7(3 * di - dj)
    nj = _lround_div7(di + 2 * dj)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _up_ap7r(i, j, k):  # cw
    di = i - k
    dj = j - k
    ni = _lround_div7(2 * di + dj)
    nj = _lround_div7(3 * dj - di)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k):  # ccw
    ni = 3 * i + 1 * j + 0 * k
    nj = 0 * i + 3 * j + 1 * k
    nk = 1 * i + 0 * j + 3 * k
    return _ijk_normalize(ni, nj, nk)


def _down_ap7r(i, j, k):  # cw
    ni = 3 * i + 0 * j + 1 * k
    nj = 1 * i + 3 * j + 0 * k
    nk = 0 * i + 1 * j + 3 * k
    return _ijk_normalize(ni, nj, nk)


def _down_ap3(i, j, k):
    ni = 2 * i + 1 * j + 0 * k
    nj = 0 * i + 2 * j + 1 * k
    nk = 1 * i + 0 * j + 2 * k
    return _ijk_normalize(ni, nj, nk)


def _down_ap3r(i, j, k):
    ni = 2 * i + 0 * j + 1 * k
    nj = 1 * i + 2 * j + 0 * k
    nk = 0 * i + 1 * j + 2 * k
    return _ijk_normalize(ni, nj, nk)


def _ijk_rotate60_ccw(i, j, k):
    return _ijk_normalize(i + k, i + j, j + k)


def _ijk_rotate60_cw(i, j, k):
    return _ijk_normalize(i + j, j + k, i + k)


_UNIT_LUT = np.full(8, -1, dtype=np.int8)
for _d in range(7):
    _UNIT_LUT[(_UNIT_VECS[_d, 0] << 2) | (_UNIT_VECS[_d, 1] << 1)
              | _UNIT_VECS[_d, 2]] = _d


def _unit_ijk_to_digit(i, j, k):
    """map normalized unit ijk to digit 0-6 (invalid -> -1); single LUT
    gather instead of 7 compare passes."""
    key = (i << 2) | (j << 1) | k
    valid = ((i | j | k) >> 1) == 0  # all components in {0,1}
    key = np.where(valid, key, 0)
    return np.where(valid, _UNIT_LUT[key], np.int8(-1))


def _is_class_iii(res):
    return res % 2 == 1

# ---------------------------------------------------------------------------
# Geometric derivation of the H3 base-cell / face-neighbor tables.
#
# Runs once at import (<50 ms). The derivation was cross-validated against
# golden vectors from the reference's shipped datasets (see module
# docstring); the numbering rule (latitude desc, longitude asc) reproduces
# the canonical H3 base-cell numbering including the pentagon list.
# ---------------------------------------------------------------------------


class _H3Tables:
    __slots__ = (
        "bc_home_face", "bc_home_i", "bc_home_j", "bc_home_k",
        "bc_is_pent", "bc_cw_offset",
        "slot_bc", "slot_rot",
        "neigh_face", "neigh_rot", "neigh_trans_i", "neigh_trans_j",
        "neigh_trans_k",
    )


def _derive_tables():
    T = _H3Tables()

    # --- enumerate all (face, i, j, k) slots in {0..2}^3 -------------------
    f_all, i_all, j_all, k_all = np.meshgrid(
        np.arange(20), np.arange(3), np.arange(3), np.arange(3), indexing="ij"
    )
    f_all = f_all.ravel()
    i_all = i_all.ravel()
    j_all = j_all.ravel()
    k_all = k_all.ravel()
    x, y = _ijk_to_hex2d(i_all, j_all, k_all)
    lat, lng = _hex2d_to_geo(f_all, x, y, 0)
    xyz = _geo_to_xyz(lat, lng)

    # ownership: slot's face is (tied-)closest to the unprojected center
    dots = xyz @ FACE_CENTER_XYZ.T
    best = dots.max(axis=1)
    owned = dots[np.arange(len(f_all)), f_all] > best - 1e-9

    # --- group owned slots into 122 distinct base-cell centers -------------
    own_idx = np.nonzero(owned)[0]
    centers = []          # list of xyz
    members = []          # list of list of slot indices
    for s in own_idx:
        hit = -1
        for ci, c in enumerate(centers):
            if abs(c[0] - xyz[s, 0]) < 1e-6 and abs(c[1] - xyz[s, 1]) < 1e-6 \
                    and abs(c[2] - xyz[s, 2]) < 1e-6:
                hit = ci
                break
        if hit < 0:
            centers.append(xyz[s])
            members.append([s])
        else:
            members[hit].append(s)
    assert len(centers) == 122, f"expected 122 base cells, got {len(centers)}"

    # canonical H3 numbering: latitude desc, longitude asc
    clat = np.array([math.asin(c[2]) for c in centers])
    clng = np.array([math.atan2(c[1], c[0]) for c in centers])
    order = sorted(range(122), key=lambda n: (-clat[n], clng[n]))
    centers = [centers[n] for n in order]
    members = [members[n] for n in order]
    center_xyz = np.array(centers)

    n_faces = [len({int(f_all[s]) for s in members[bc]}) for bc in range(122)]
    T.bc_is_pent = np.array([nf == 5 for nf in n_faces])
    assert [b for b in range(122) if T.bc_is_pent[b]] == _PENT_LIST

    # --- home face + canonical ijk per base cell ---------------------------
    # pentagons: home = lowest face (its slot there); hexagons on one face:
    # that face with the normalized minimal-sum coords; hexagons straddling
    # two faces: the face whose normalized coords are (1,1,0) (verified
    # against the published table head and the golden chains).
    T.bc_home_face = np.zeros(122, dtype=np.int64)
    T.bc_home_i = np.zeros(122, dtype=np.int64)
    T.bc_home_j = np.zeros(122, dtype=np.int64)
    T.bc_home_k = np.zeros(122, dtype=np.int64)
    for bc in range(122):
        slots = [(int(f_all[s]), int(i_all[s]), int(j_all[s]), int(k_all[s]))
                 for s in members[bc]]
        # normalize away the +(1,1,1) duplicates, keep minimal-sum per face
        per_face = {}
        for (f, i, j, k) in slots:
            cur = per_face.get(f)
            if cur is None or (i + j + k) < sum(cur):
                per_face[f] = (i, j, k)
        if T.bc_is_pent[bc]:
            # the pentagon overage machinery assumes the pentagon sits at
            # the I-vertex (maxDim,0,0) of its home face, so the home must
            # be a face whose vertex 0 hosts this pentagon
            cands = [f for f, c in per_face.items() if c == (2, 0, 0)]
            assert cands, (bc, per_face)
            hf = min(cands)
        elif len(per_face) == 1:
            hf = next(iter(per_face))
        else:
            # edge cells: prefer the face where coords are (1,1,0); when both
            # faces carry the same coord type, take the lower face. Matches
            # the published table head (bc1/bc5/bc22 -> (1,1,0) face; bc11 ->
            # lower face); the same-coord equatorial cells are a documented
            # convention choice (golden vectors do not reach them).
            cands = [f for f, c in per_face.items() if c == (1, 1, 0)]
            hf = cands[0] if len(cands) == 1 else min(per_face)
        T.bc_home_face[bc] = hf
        T.bc_home_i[bc], T.bc_home_j[bc], T.bc_home_k[bc] = per_face[hf]

    # --- orientation (ccw 60-degree rotations) per (base cell, face) -------
    # beta = angle (ccw, in face f's hex2d frame) at which the home face's
    # i-axis appears; numRots = (-beta/60) mod 6. Derived with a small
    # epsilon step along the home i-axis unprojected to the sphere and
    # reprojected onto f.
    def _rot_for(bc, f, cf):
        hf = int(T.bc_home_face[bc])
        if f == hf:
            return 0, 0.0
        hi, hj, hk = int(T.bc_home_i[bc]), int(T.bc_home_j[bc]), int(T.bc_home_k[bc])
        hx, hy = _ijk_to_hex2d(np.array([hi]), np.array([hj]), np.array([hk]))
        eps = 1e-4
        lat0, lng0 = _hex2d_to_geo(np.array([hf]), hx, hy, 0)
        lat1, lng1 = _hex2d_to_geo(np.array([hf]), hx + eps, hy, 0)
        # reproject both points onto face f
        _, x0, y0 = _geo_to_hex2d(lat0, lng0, 0, face=np.array([f]))
        _, x1, y1 = _geo_to_hex2d(lat1, lng1, 0, face=np.array([f]))
        beta = math.degrees(math.atan2(float(y1[0] - y0[0]), float(x1[0] - x0[0])))
        n = int(round(-beta / 60.0)) % 6
        resid = -beta - 60.0 * round(-beta / 60.0)
        return n, resid

    # slot tables: physical matches first (positions that coincide with a
    # true cell center), rotations derived per (bc, face)
    T.slot_bc = np.full((20, 3, 3, 3), -1, dtype=np.int64)
    T.slot_rot = np.zeros((20, 3, 3, 3), dtype=np.int64)
    d2 = ((xyz[:, None, :] - center_xyz[None, :, :]) ** 2).sum(axis=2)
    nearest = d2.argmin(axis=1)
    near_ok = d2[np.arange(len(f_all)), nearest] < 1e-10
    rot_cache = {}
    pent_resid = {}  # (bc, face) -> residual sign for cw-offset derivation
    for s in range(len(f_all)):
        if not near_ok[s]:
            continue
        f = int(f_all[s])
        bc = int(nearest[s])
        key = (bc, f)
        if key not in rot_cache:
            n, resid = _rot_for(bc, f, None)
            rot_cache[key] = n
            if T.bc_is_pent[bc]:
                pent_resid[key] = resid
        T.slot_bc[f, i_all[s], j_all[s], k_all[s]] = bc
        T.slot_rot[f, i_all[s], j_all[s], k_all[s]] = rot_cache[key]

    # pentagon forward conventions: apply the fitted table (see
    # _PENT_SLOT_FIT / _h3_pentfit.py) - the angle-rounding heuristic is
    # ambiguous at pentagons (faces sit 72 deg apart on a 60-deg lattice)
    T.bc_cw_offset = np.full((122, 2), -1, dtype=np.int64)
    cw_faces = {}
    for (bc, f), (rot, cw) in _PENT_SLOT_FIT.items():
        sl = np.argwhere(T.slot_bc[f] == bc)
        for s in sl:
            T.slot_rot[f][tuple(s)] = rot
        if cw:
            cw_faces.setdefault(bc, []).append(f)
    for bc, faces in cw_faces.items():
        for m, f in enumerate(sorted(faces)[:2]):
            T.bc_cw_offset[bc, m] = f

    # --- face neighbor (overage) transforms --------------------------------
    # For each face f and quadrant IJ/KI/JK: neighbor face g and the lattice
    # map ijk_g = Rot60ccw^n(ijk_f) + t (res-0 units), solved from the two
    # shared vertex pentagons of that edge and verified on the mid-edge cell.
    T.neigh_face = np.zeros((20, 4), dtype=np.int64)
    T.neigh_rot = np.zeros((20, 4), dtype=np.int64)
    T.neigh_trans_i = np.zeros((20, 4), dtype=np.int64)
    T.neigh_trans_j = np.zeros((20, 4), dtype=np.int64)
    T.neigh_trans_k = np.zeros((20, 4), dtype=np.int64)

    # vertex positions per face: unproject (2,0,0) / (0,2,0) / (0,0,2)
    vcoords = [(2, 0, 0), (0, 2, 0), (0, 0, 2)]
    vert_xyz = np.zeros((20, 3, 3))
    for m, (vi, vj, vk) in enumerate(vcoords):
        vx, vy = _ijk_to_hex2d(np.array([vi] * 20), np.array([vj] * 20), np.array([vk] * 20))
        vla, vlo = _hex2d_to_geo(np.arange(20), vx, vy, 0)
        vert_xyz[:, m, :] = _geo_to_xyz(vla, vlo)

    # per-face lattice coords of each pentagon (from owned slots)
    pent_coord = {}  # (bc, face) -> (i,j,k)
    for bc in _PENT_LIST:
        for s in members[bc]:
            pent_coord[(bc, int(f_all[s]))] = (
                int(i_all[s]), int(j_all[s]), int(k_all[s]))

    def _pent_at(p_xyz):
        d = ((center_xyz[_PENT_LIST] - p_xyz) ** 2).sum(axis=1)
        return _PENT_LIST[int(d.argmin())]

    def _rot2d_ccw_n(a, b, n):
        for _ in range(n % 6):
            a, b = a - b, a
        return a, b

    # quadrant -> vertex pair (edge crossed): IJ edge between v0,v1 etc.
    quad_edge = {1: (0, 1), 2: (2, 0), 3: (1, 2)}  # 1=IJ 2=KI 3=JK
    adj = np.argsort(-(FACE_CENTER_XYZ @ FACE_CENTER_XYZ.T), axis=1)[:, 1:4]
    for f in range(20):
        for quad, (va, vb) in quad_edge.items():
            mid = vert_xyz[f, va] + vert_xyz[f, vb]
            mid /= np.linalg.norm(mid)
            # neighbor face across this edge
            g = max(
                (int(gg) for gg in adj[f]),
                key=lambda gg: float(FACE_CENTER_XYZ[gg] @ mid),
            )
            pa = _pent_at(vert_xyz[f, va])
            pb = _pent_at(vert_xyz[f, vb])
            fa, fb = pent_coord[(pa, f)], pent_coord[(pb, f)]
            ga, gb = pent_coord[(pa, g)], pent_coord[(pb, g)]
            # 2D lattice coords (i-k, j-k)
            fa2 = (fa[0] - fa[2], fa[1] - fa[2])
            fb2 = (fb[0] - fb[2], fb[1] - fb[2])
            ga2 = (ga[0] - ga[2], ga[1] - ga[2])
            gb2 = (gb[0] - gb[2], gb[1] - gb[2])
            dfa = (fa2[0] - fb2[0], fa2[1] - fb2[1])
            dga = (ga2[0] - gb2[0], ga2[1] - gb2[1])
            sol = None
            for n in range(6):
                ra, rb = _rot2d_ccw_n(dfa[0], dfa[1], n)
                if (ra, rb) == dga:
                    ta = ga2[0] - _rot2d_ccw_n(fa2[0], fa2[1], n)[0]
                    tb = ga2[1] - _rot2d_ccw_n(fa2[0], fa2[1], n)[1]
                    sol = (n, ta, tb)
                    break
            assert sol is not None, (f, quad)
            n, ta, tb = sol
            T.neigh_face[f, quad] = g
            T.neigh_rot[f, quad] = n
            # lift 2D translation (a,b) to ijk (a,b,0) normalized
            ti, tj, tk = _ijk_normalize(
                np.array([ta]), np.array([tb]), np.array([0]))
            T.neigh_trans_i[f, quad] = int(ti[0])
            T.neigh_trans_j[f, quad] = int(tj[0])
            T.neigh_trans_k[f, quad] = int(tk[0])
        T.neigh_face[f, 0] = f  # CENTER: identity

    # --- fill remaining (beyond-triangle) slots via the edge transforms ----
    for s in range(len(f_all)):
        f, i, j, k = int(f_all[s]), int(i_all[s]), int(j_all[s]), int(k_all[s])
        if T.slot_bc[f, i, j, k] >= 0:
            continue
        ci, cj, ck = np.array([i]), np.array([j]), np.array([k])
        cf = f
        rot_acc = 0
        for _hop in range(3):
            if int(ci[0] + cj[0] + ck[0]) <= 2:
                break
            if ck[0] > 0:
                quad = 3 if cj[0] > 0 else 2
            else:
                quad = 1
            n = int(T.neigh_rot[cf, quad])
            for _ in range(n):
                ci, cj, ck = _ijk_rotate60_ccw(ci, cj, ck)
            ci = ci + T.neigh_trans_i[cf, quad]
            cj = cj + T.neigh_trans_j[cf, quad]
            ck = ck + T.neigh_trans_k[cf, quad]
            ci, cj, ck = _ijk_normalize(ci, cj, ck)
            cf = int(T.neigh_face[cf, quad])
            rot_acc += n
        bc = int(T.slot_bc[cf, ci[0], cj[0], ck[0]])
        assert bc >= 0, (f, i, j, k, cf, ci, cj, ck)
        T.slot_bc[f, i, j, k] = bc
        T.slot_rot[f, i, j, k] = (rot_acc + T.slot_rot[cf, ci[0], cj[0], ck[0]]) % 6
    return T


_T = _derive_tables()

BASE_CELL_COUNT = 122
PENTAGON_BASE_CELLS = np.array(_PENT_LIST, dtype=np.int64)


# ---------------------------------------------------------------------------
# H3 index packing / unpacking (v3/v4 64-bit cell index layout)
# ---------------------------------------------------------------------------

_H3_MODE_CELL = np.uint64(1) << np.uint64(59)
_RES_SHIFT = np.uint64(52)
_BC_SHIFT = np.uint64(45)


def _pack(res, bc, digits):
    """digits: (N, 15) int array, digit for res r at column r-1; unused = 7."""
    h = np.full(bc.shape, _H3_MODE_CELL, dtype=np.uint64)
    h |= np.uint64(res) << _RES_SHIFT
    h |= bc.astype(np.uint64) << _BC_SHIFT
    for r in range(1, 16):
        d = digits[:, r - 1].astype(np.uint64) if r <= res else np.uint64(7)
        h |= d << np.uint64((15 - r) * 3)
    return h


def get_resolution(h):
    h = np.asarray(h, dtype=np.uint64)
    return ((h >> _RES_SHIFT) & np.uint64(0xF)).astype(np.int64)


def get_base_cell(h):
    h = np.asarray(h, dtype=np.uint64)
    return ((h >> _BC_SHIFT) & np.uint64(0x7F)).astype(np.int64)


def _get_digits(h, res):
    """(N, res) int8 digit matrix (digit of res r at column r-1)."""
    h = np.asarray(h, dtype=np.uint64)
    out = np.empty((h.shape[0], res), dtype=np.int8)
    for r in range(1, res + 1):
        out[:, r - 1] = ((h >> np.uint64((15 - r) * 3)) & np.uint64(7)).astype(np.int8)
    return out


def is_pentagon(h):
    h = np.asarray(h, dtype=np.uint64)
    bc = get_base_cell(h)
    res = get_resolution(h)
    pent = np.isin(bc, PENTAGON_BASE_CELLS)
    # a cell is a pentagon iff base cell is pentagonal and all digits are 0
    alldig = np.zeros(h.shape, dtype=np.uint64)
    mx = int(res.max()) if h.size else 0
    nonzero = np.zeros(h.shape, dtype=bool)
    for r in range(1, mx + 1):
        d = (h >> np.uint64((15 - r) * 3)) & np.uint64(7)
        nonzero |= (r <= res) & (d != 0)
    return pent & ~nonzero


def _rotate_digits(digits, n, pentagon=False):
    """rotate all digits of each row ccw by n[i] steps (n: per-row array).
    pentagon variant (_h3RotatePent60ccw iterated) handled by caller."""
    out = digits.copy()
    for step in range(1, 6):
        m = n >= step
        if not m.any():
            continue
        out[m] = _ROT_CCW[out[m]]
    return out


def _leading_nonzero_digit(digits):
    """per-row first nonzero digit (0 if none; res-0 cells have zero
    digit columns -> all 0)."""
    if digits.shape[1] == 0:
        return np.zeros(digits.shape[0], dtype=np.int8)
    nz = digits != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    lead = digits[np.arange(digits.shape[0]), first]
    return np.where(has, lead, 0).astype(np.int8)


def _rotate60ccw_index_digits(digits, mask):
    digits[mask] = _ROT_CCW[digits[mask]]
    return digits


def _h3_rotate_pent60_ccw_rows(digits, rows):
    """_h3RotatePent60ccw applied once to the given rows (digits modified
    in place): rotate digits ccw; if leading nonzero digit becomes K (1),
    rotate the whole index ccw once more."""
    digits[rows] = _ROT_CCW[digits[rows]]
    lead = _leading_nonzero_digit(digits[rows])
    extra = rows[lead == 1]
    if extra.size:
        digits[extra] = _ROT_CCW[digits[extra]]
    return digits


# ---------------------------------------------------------------------------
# latlng -> cell (vectorized; the engine's hot path, SURVEY.md F1)
# ---------------------------------------------------------------------------

def latlng_to_cell(lat_deg, lng_deg, res):
    """vectorized geo -> H3 cell index (uint64) at resolution 0..15.

    Replaces the reference's per-row h3.geo_to_h3 loop
    (src/geoserver/correlator.py:90-93) with batch NumPy.
    """
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64)).ravel()
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64)).ravel()
    face, x, y = _geo_to_hex2d(lat, lng, res)
    return _hex2d_to_cell(face, x, y, res)


def latlng_to_cells_multi(lat_deg, lng_deg, res_list):
    """independent cell assignment at EVERY res in res_list, sharing the
    expensive spherical work (xyz, face pick, arccos, azimuth, tan and the
    two Class II/III trig pairs) across resolutions — bit-identical to
    calling latlng_to_cell once per res, ~3x cheaper for res 0..9.

    Returns {res: uint64 array}."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64)).ravel()
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64)).ravel()
    xyz = _geo_to_xyz(lat, lng)
    face = _closest_face(xyz)
    dot = np.clip((xyz * FACE_CENTER_XYZ[face]).sum(axis=-1), -1.0, 1.0)
    r = np.arccos(dot)
    az = _geo_azimuth(FACE_CENTER_GEO[face, 0], FACE_CENTER_GEO[face, 1],
                      lat, lng)
    theta_even = np.mod(
        FACE_AXES_AZ_RADS_CII[face, 0] - np.mod(az, 2 * math.pi),
        2 * math.pi)
    tanr = np.tan(r) / RES0_U_GNOMONIC
    zero = r < 1e-16
    trig = {False: (np.cos(theta_even), np.sin(theta_even))}
    if any(res % 2 == 1 for res in res_list):
        theta_odd = np.mod(theta_even - M_AP7_ROT_RADS, 2 * math.pi)
        trig[True] = (np.cos(theta_odd), np.sin(theta_odd))
    out = {}
    for res in res_list:
        ct, st = trig[res % 2 == 1]
        rg = tanr * (M_SQRT7 ** res)
        x = np.where(zero, 0.0, rg * ct)
        y = np.where(zero, 0.0, rg * st)
        out[res] = _hex2d_to_cell(face, x, y, res)
    return out


def _hex2d_to_cell(face, x, y, res):
    """(face, hex-plane x, y at res) -> packed H3 index (the published
    _faceIjkToH3 digit walk + base-cell/pentagon rotations)."""
    n = np.asarray(x).shape[0]
    i, j, k = _hex2d_to_ijk(x, y)

    digits = np.zeros((n, 15), dtype=np.int8)
    # build digits from finest res up (published _faceIjkToH3 loop)
    for r in range(res, 0, -1):
        li, lj, lk = i, j, k
        if _is_class_iii(r):
            i, j, k = _up_ap7(i, j, k)
            ci, cj, ck = _down_ap7(i, j, k)
        else:
            i, j, k = _up_ap7r(i, j, k)
            ci, cj, ck = _down_ap7r(i, j, k)
        di, dj, dk = _ijk_normalize(li - ci, lj - cj, lk - ck)
        digits[:, r - 1] = _unit_ijk_to_digit(di, dj, dk)

    # res-0 coords must lie in {0..2}^3 on the start face
    bc = _T.slot_bc[face, i, j, k]
    rot = _T.slot_rot[face, i, j, k]

    pent = np.isin(bc, PENTAGON_BASE_CELLS)
    if pent.any():
        # force rotation out of the missing k-axes sub-sequence
        lead = _leading_nonzero_digit(digits)
        adj = np.nonzero(pent & (lead == 1))[0]
        if adj.size:
            is_cw = (_T.bc_cw_offset[bc[adj], 0] == face[adj]) | (
                _T.bc_cw_offset[bc[adj], 1] == face[adj])
            cw_rows = adj[is_cw]
            ccw_rows = adj[~is_cw]
            if cw_rows.size:
                digits[cw_rows] = _ROT_CW[digits[cw_rows]]
            if ccw_rows.size:
                digits[ccw_rows] = _ROT_CCW[digits[ccw_rows]]
        # pentagon rotations use _h3RotatePent60ccw
        prows = np.nonzero(pent)[0]
        prot = rot[prows].copy()
        for _step in range(5):
            active = prows[prot > 0]
            if not active.size:
                break
            digits = _h3_rotate_pent60_ccw_rows(digits, active)
            prot -= 1
        hexmask = ~pent
    else:
        hexmask = np.ones(n, dtype=bool)

    # hexagon base cells: rotate all digits ccw `rot` times (lookup-composed)
    hx = np.nonzero(hexmask & (rot > 0))[0]
    if hx.size:
        rr = rot[hx] % 6
        for step in range(1, 6):
            m = hx[rr >= step]
            if m.size:
                digits[m] = _ROT_CCW[digits[m]]
    return _pack(res, bc, digits)


# ---------------------------------------------------------------------------
# cell -> latlng centroid (vectorized; SURVEY.md F2, geomesh.py:1301-1316)
# ---------------------------------------------------------------------------

_UNIT_SCALE_CII = {r: 7 ** (r // 2) for r in range(0, 17, 2)}
_MAX_DIM_CII = {r: 2 * 7 ** (r // 2) for r in range(0, 17, 2)}


def _adjust_overage_class_ii(face, i, j, k, res, pent_leading4, substrate=False):
    """vectorized _adjustOverageClassII; returns (face,i,j,k,had_overage)."""
    max_dim = _MAX_DIM_CII[res] * (3 if substrate else 1)
    tot = i + j + k
    over = tot > max_dim
    if not over.any():
        return face, i, j, k, over
    quad = np.where(k > 0, np.where(j > 0, 3, 2), 1)
    # pentagon leading-4 adjustment in the KI quadrant: rotate about the
    # pentagon origin (maxDim,0,0) cw before translating
    padj = over & pent_leading4 & (quad == 2)
    if padj.any():
        oi = i[padj] - max_dim
        oj = j[padj]
        ok = k[padj]
        ri, rj, rk = oi + oj, oj + ok, oi + ok  # rotate60cw (unnormalized ok)
        i = i.copy(); j = j.copy(); k = k.copy()
        i[padj] = ri + max_dim
        j[padj] = rj
        k[padj] = rk
    fo = np.where(over, _T.neigh_face[face, quad], face)
    nrot = np.where(over, _T.neigh_rot[face, quad], 0)
    ti = np.where(over, _T.neigh_trans_i[face, quad], 0)
    tj = np.where(over, _T.neigh_trans_j[face, quad], 0)
    tk = np.where(over, _T.neigh_trans_k[face, quad], 0)
    ni, nj, nk = i.copy(), j.copy(), k.copy()
    for step in range(1, 6):
        m = over & (nrot >= step)
        if m.any():
            ri, rj, rk = ni[m] + nk[m], ni[m] + nj[m], nj[m] + nk[m]
            ni[m], nj[m], nk[m] = ri, rj, rk
    scale = _UNIT_SCALE_CII[res] * (3 if substrate else 1)
    ni = ni + ti * scale
    nj = nj + tj * scale
    nk = nk + tk * scale
    ni, nj, nk = _ijk_normalize(ni, nj, nk)
    face = np.where(over, fo, face)
    i = np.where(over, ni, i)
    j = np.where(over, nj, j)
    k = np.where(over, nk, k)
    return face, i, j, k, over


def _cell_to_faceijk(h):
    """vectorized _h3ToFaceIjk: cell -> (face, i, j, k, work_res) where
    work_res is res (Class II) or res+1 (Class III dropped one level)."""
    h = np.asarray(h, dtype=np.uint64).ravel()
    res = int(get_resolution(h[:1])[0]) if h.size else 0
    resv = get_resolution(h)
    if h.size and not (resv == res).all():
        raise ValueError("mixed resolutions in one batch")
    bc = get_base_cell(h)
    digits = _get_digits(h, res)
    pent = np.isin(bc, PENTAGON_BASE_CELLS)

    dig = digits.copy()
    if pent.any():
        lead = _leading_nonzero_digit(dig)
        m = pent & (lead == 5)
        if m.any():
            dig[m] = _ROT_CW[dig[m]]

    face = _T.bc_home_face[bc]
    i = _T.bc_home_i[bc].copy()
    j = _T.bc_home_j[bc].copy()
    k = _T.bc_home_k[bc].copy()
    for r in range(1, res + 1):
        if _is_class_iii(r):
            i, j, k = _down_ap7(i, j, k)
        else:
            i, j, k = _down_ap7r(i, j, k)
        d = dig[:, r - 1].astype(np.int64)
        i = i + _UNIT_VECS[d, 0]
        j = j + _UNIT_VECS[d, 1]
        k = k + _UNIT_VECS[d, 2]
        i, j, k = _ijk_normalize(i, j, k)

    # possible overage (h3ToFaceIjkWithInitializedFijk return condition)
    possible = pent | ~((res == 0) | ((i == 0) & (j == 0) & (k == 0)))
    orig = (i.copy(), j.copy(), k.copy())
    work_res = res
    if _is_class_iii(res):
        i, j, k = _down_ap7r(i, j, k)
        work_res = res + 1
    lead = _leading_nonzero_digit(dig)
    pent_l4 = pent & (lead == 4)
    face2, i2, j2, k2, over = _adjust_overage_class_ii(
        face, i, j, k, work_res, pent_l4)
    ever_over = over.copy()
    # secondary overages for pentagons only (hexagons adjust exactly once)
    prows = np.nonzero(over & pent)[0]
    for _ in range(4):
        if not prows.size:
            break
        f3, i3, j3, k3, over2 = _adjust_overage_class_ii(
            face2[prows], i2[prows], j2[prows], k2[prows], work_res,
            np.zeros(prows.shape, dtype=bool))
        face2[prows], i2[prows], j2[prows], k2[prows] = f3, i3, j3, k3
        prows = prows[over2]
    over = ever_over
    # rows where overage is impossible keep original coords/res
    no = ~possible
    if _is_class_iii(res):
        # rows with overage stay in the res+1 grid; rows without revert
        revert = ~over if False else ~possible  # see below
    # H3 semantics: rows that HAD overage keep adjusted coords at work_res;
    # rows without overage revert to original coords at res. We therefore
    # return per-row work resolution.
    row_res = np.full(h.shape, work_res, dtype=np.int64)
    if work_res != res:
        had = over | np.zeros_like(over)
        # rows with no overage at all: revert coords and res
        nv = ~had
        i2 = np.where(nv, orig[0], i2)
        j2 = np.where(nv, orig[1], j2)
        k2 = np.where(nv, orig[2], k2)
        row_res = np.where(nv, res, work_res)
        face2 = np.where(nv, face, face2)
    i2 = np.where(no, orig[0], i2)
    j2 = np.where(no, orig[1], j2)
    k2 = np.where(no, orig[2], k2)
    face2 = np.where(no, face, face2)
    row_res = np.where(no, res, row_res)
    return face2, i2, j2, k2, row_res, res


def cell_to_latlng(h):
    """vectorized cell centroid -> (lat_deg, lng_deg)."""
    h = np.asarray(h, dtype=np.uint64).ravel()
    if h.size == 0:
        return np.empty(0), np.empty(0)
    resv = get_resolution(h)
    lat = np.empty(h.shape, dtype=np.float64)
    lng = np.empty(h.shape, dtype=np.float64)
    for res in np.unique(resv):
        sel = np.nonzero(resv == res)[0]
        face, i, j, k, row_res, _ = _cell_to_faceijk(h[sel])
        x, y = _ijk_to_hex2d(i, j, k)
        la = np.empty(sel.shape, dtype=np.float64)
        lo = np.empty(sel.shape, dtype=np.float64)
        for rr in np.unique(row_res):
            m = row_res == rr
            la[m], lo[m] = _hex2d_to_geo(face[m], x[m], y[m], int(rr))
        lat[sel] = la
        lng[sel] = lo
    return np.degrees(lat), np.degrees(lng)


# ---------------------------------------------------------------------------
# parent / children / string conversions
# ---------------------------------------------------------------------------

def cell_to_parent(h, parent_res):
    h = np.asarray(h, dtype=np.uint64)
    res = get_resolution(h)
    pr = np.uint64(parent_res)
    out = (h & ~np.uint64(0xF << 52)) | (pr << _RES_SHIFT)
    for r in range(int(parent_res) + 1, 16):
        out |= np.uint64(7) << np.uint64((15 - r) * 3)
    if (res < parent_res).any():
        raise ValueError("parent_res coarser than cell res required")
    return out


def cell_to_string(h):
    """uint64 -> 15-char lowercase hex (h3 v3 string form)."""
    h = np.asarray(h, dtype=np.uint64).ravel()
    # vectorized hex formatting via char arithmetic
    out = np.empty((h.shape[0], 16), dtype="<U1")
    hexd = np.array(list("0123456789abcdef"))
    for pos in range(16):
        nib = ((h >> np.uint64((15 - pos) * 4)) & np.uint64(0xF)).astype(np.int64)
        out[:, pos] = hexd[nib]
    joined = out.view("<U16").ravel()
    # strip the single leading zero (mode-1 cells always start '0x0...')
    return np.char.lstrip(joined, "0")


def string_to_cell(s):
    arr = np.asarray(s)
    flat = arr.ravel()
    out = np.empty(flat.shape, dtype=np.uint64)
    for idx in range(flat.shape[0]):  # driver-side only; not a hot path
        out[idx] = np.uint64(int(flat[idx], 16))
    return out.reshape(arr.shape)


# cells per resolution (reference geomesh.py:87-104 CELLS_AT_RESOLUTION)
CELLS_AT_RESOLUTION = [2 + 120 * 7 ** r for r in range(16)]

# mean hexagon area km^2 per res (reference geomesh.py:107-124); derived
# from sphere area (R=6371.0088 km) / cell count
_EARTH_AREA_KM2 = 4.0 * math.pi * 6371.0088 ** 2
AVG_CELL_AREA_KM2 = [_EARTH_AREA_KM2 / c for c in CELLS_AT_RESOLUTION]


# ---------------------------------------------------------------------------
# k-ring / grid disk (SURVEY.md F6) and polyfill support
# ---------------------------------------------------------------------------

def _disk_offsets(k):
    """all ijk offsets with hex grid distance <= k, as 2D axial (a, b) =
    (i - k, j - k) integer vectors; 1 + 3k(k+1) of them."""
    offs = []
    for a in range(-k, k + 1):
        for b in range(-k, k + 1):
            # hex distance in axial coords
            if max(abs(a), abs(b), abs(a - b)) <= k:
                offs.append((a, b))
    return np.array(offs, dtype=np.float64)


# empirical global minimum center-to-neighbor distance per res (km), used
# for sampling guarantees; min inradius >= min_neighbor_dist / 2
_EDGE_KM_RES0 = 1281.256011  # res-0 max edge; scaled by sqrt(7) per res


def min_inradius_km(res):
    """conservative global lower bound on cell inradius at `res`."""
    # hexagon inradius = edge * sqrt(3)/2; cells shrink by sqrt(7)/res and
    # distort down to ~0.83x near face boundaries; 0.5 is a safe floor
    return _EDGE_KM_RES0 * (7.0 ** (-res / 2.0)) * 0.5


def k_ring(h, k):
    """grid disk: all cells within grid distance k of each input cell.

    Returns (N, 1+3k(k+1)) uint64 array (may contain duplicates of the
    origin near pentagons, where the distance-k disk is smaller).

    Implementation: lattice offsets in the owning face's hex plane,
    re-indexed through latlng_to_cell. Exact within a face; near icosa
    edges the re-indexing keeps results valid cells (the reference
    itself never calls k_ring - SURVEY.md F6). Pentagon-adjacent
    exactness is golden-tested: k=1 around every pentagon dedupes to the
    pentagon + its 5 true neighbors
    (tests/test_h3core_properties.py::test_pentagon_k_ring_exact).
    """
    h = np.asarray(h, dtype=np.uint64).ravel()
    res = int(get_resolution(h[:1])[0])
    lat, lng = cell_to_latlng(h)
    latr = np.radians(lat)
    lngr = np.radians(lng)
    face, x, y = _geo_to_hex2d(latr, lngr, res)
    offs = _disk_offsets(k)  # (M, 2) axial
    # axial (a, b) -> hex2d: x = a - b/2, y = b * sin60
    ox = offs[:, 0] - offs[:, 1] / 2.0
    oy = offs[:, 1] * M_SIN60
    X = x[:, None] + ox[None, :]
    Y = y[:, None] + oy[None, :]
    F = np.repeat(face, offs.shape[0]).reshape(face.shape[0], offs.shape[0])
    la, lo = _hex2d_to_geo(F.ravel(), X.ravel(), Y.ravel(), res)
    cells = latlng_to_cell(np.degrees(la), np.degrees(lo), res)
    return cells.reshape(h.shape[0], offs.shape[0])


def grid_disk(h, k):
    """alias matching h3-py v4 naming."""
    return k_ring(h, k)


def cell_boundary(h):
    """(N,) cells -> (N, 6, 2) boundary vertices (lat_deg, lng_deg).

    Reference analogue: h3.h3_to_geo_boundary (geomesh.py:1335,1354 - used
    only by the overlap calc, SURVEY.md F5/A5). Hexagon vertices are
    placed in the cell's face-local lattice plane (the same plane k_ring
    uses, where adjacent centers sit at unit distance): circumradius
    1/sqrt(3) at angles 30 + 60k degrees, then projected back to the
    sphere. Exact within a face; near icosahedron edges the true H3
    boundary bends at the edge while this stays planar (documented
    approximation; adequate for the area-overlap use, which the
    reference never calls upstream).

    Pentagons (12 per res) get their TRUE 5-vertex topology (round-3,
    VERDICT next-step #7): each vertex is the point where the pentagon
    meets two adjacent neighbors, computed as the spherical circumcenter
    of the three cell centroids (the Voronoi 3-cell-meeting property).
    The fixed (6, 2) shape is preserved by inserting the planar midpoint
    of the first edge — collinear in (lat, lng) clip space, so convex
    consumers see the same pentagon with no degenerate edge. Icosa-edge
    distortion bends along pentagon edges remain out of scope
    (invariant-tested in tests/test_h3core_properties.py).
    """
    h = np.asarray(h, dtype=np.uint64).ravel()
    res = int(get_resolution(h[:1])[0])
    lat, lng = cell_to_latlng(h)
    face, x, y = _geo_to_hex2d(np.radians(lat), np.radians(lng), res)
    ang = np.radians(30.0 + 60.0 * np.arange(6))
    vx = np.cos(ang) / math.sqrt(3.0)
    vy = np.sin(ang) / math.sqrt(3.0)
    X = x[:, None] + vx[None, :]
    Y = y[:, None] + vy[None, :]
    F = np.repeat(face, 6).reshape(-1, 6)
    la, lo = _hex2d_to_geo(F.ravel(), X.ravel(), Y.ravel(), res)
    out = np.stack([np.degrees(la), np.degrees(lo)], axis=-1)
    out = out.reshape(h.shape[0], 6, 2)
    pent = is_pentagon(h)
    if pent.any():
        out[pent] = _pentagon_boundary_rows(h[pent])
    return out


def _pentagon_topo_verts_xyz(hp):
    """one pentagon cell -> (center_xyz, (k, 3) ordered topological
    vertex unit vectors). A cell vertex is shared by exactly 3 cells;
    for a pentagon the 5 topological vertices are the meeting points
    with consecutive pairs of its 5 neighbors (k=1 ring exactness is
    golden-tested), each the spherical circumcenter of the three
    centroids: the unit normal of the plane through them, signed toward
    the pentagon center — equidistant from all three by construction.
    The circumcenter of (P, N_i, N_{i+1}) and that of (P, N_{i+1},
    N_{i+2}) are both equidistant from P and N_{i+1}, so every boundary
    arc lies exactly on a P-neighbor perpendicular-bisector great
    circle — the property the distortion-vertex invariants test."""
    one = np.array([hp], dtype=np.uint64)
    ring = np.unique(k_ring(one, 1)[0])
    nbrs = ring[ring != hp]
    pla, plo = cell_to_latlng(one)
    nla, nlo = cell_to_latlng(nbrs)
    az = _geo_azimuth(np.radians(pla[0]), np.radians(plo[0]),
                      np.radians(nla), np.radians(nlo))
    order = np.argsort(az)
    nxyz = _geo_to_xyz(np.radians(nla[order]), np.radians(nlo[order]))
    pxyz = _geo_to_xyz(np.radians(pla), np.radians(plo))[0]
    k = nbrs.shape[0]  # 5 for true pentagons
    verts = np.empty((k, 3))
    for i in range(k):
        b = nxyz[i]
        c = nxyz[(i + 1) % k]
        n = np.cross(b - pxyz, c - pxyz)
        nn = np.linalg.norm(n)
        v = n / nn if nn > 0 else pxyz
        if np.dot(v, pxyz) < 0:
            v = -v
        verts[i] = v
    return pxyz, verts


def _xyz_to_deg(v):
    return (math.degrees(math.asin(max(-1.0, min(1.0, float(v[2]))))),
            math.degrees(math.atan2(float(v[1]), float(v[0]))))


def _pentagon_boundary_rows(h):
    """(M,) pentagon cells -> (M, 6, 2) deg boundary: the 5 topological
    vertices in a fixed-width row — v0, planar-mid(v0,v1) (collinear
    filler so convex consumers see no degenerate edge), v1..v4. The
    10-vertex geometry with icosa-edge distortion vertices lives in
    pentagon_boundary_full (round 4)."""
    h = np.asarray(h, dtype=np.uint64).ravel()
    out = np.empty((h.shape[0], 6, 2), dtype=np.float64)
    for m, hp in enumerate(h):
        _, vxyz = _pentagon_topo_verts_xyz(hp)
        k = vxyz.shape[0]
        verts = np.array([_xyz_to_deg(v) for v in vxyz])
        out[m, 0] = verts[0]
        out[m, 1] = (verts[0] + verts[1]) / 2.0
        out[m, 2:2 + k - 1] = verts[1:]
        if k < 5:  # defensive: degenerate ring
            out[m, 2 + k - 1:] = verts[-1]
    return out


_ICOSA_VERTS_XYZ = None


def _icosa_vertices_xyz():
    """the 12 icosahedron vertex unit vectors = centroids of the 12
    res-0 pentagon base cells (every H3 pentagon is centered on an
    icosahedron vertex). Derived from the kernel's own tables, cached."""
    global _ICOSA_VERTS_XYZ
    if _ICOSA_VERTS_XYZ is None:
        p0 = np.array([(1 << 59) | (int(b) << 45) | 0x1FFFFFFFFFFF
                       for b in PENTAGON_BASE_CELLS], dtype=np.uint64)
        la, lo = cell_to_latlng(p0)
        _ICOSA_VERTS_XYZ = _geo_to_xyz(np.radians(la), np.radians(lo))
    return _ICOSA_VERTS_XYZ


def pentagon_boundary_full(h):
    """(M,) pentagon cells -> (verts (M, 10, 2) deg padded, n_verts
    (M,)): the published 10-vertex pentagon geometry (VERDICT r3 Next
    #8) — 5 topological vertices plus up to 5 DISTORTION vertices where
    the boundary crosses the 5 icosahedron edges radiating from the
    pentagon's center (every pentagon is centered on an icosa vertex;
    its boundary spans 5 faces, so each boundary arc bends where it
    crosses a face edge).

    Each distortion vertex is the great-circle intersection of a
    boundary arc (which lies exactly on a P-neighbor perpendicular-
    bisector plane, see _pentagon_topo_verts_xyz) with an icosa edge
    arc (pentagon center -> adjacent icosa vertex), accepted only when
    it falls strictly inside both arcs. At class-II resolutions where a
    crossing coincides with a topological vertex (the lattice aligns
    with the icosa edge) no duplicate is inserted, so n_verts is 5..10.
    Rows are padded by repeating the last vertex."""
    h = np.asarray(h, dtype=np.uint64).ravel()
    verts_out = np.empty((h.shape[0], 10, 2), dtype=np.float64)
    n_out = np.empty(h.shape[0], dtype=np.int64)
    icosa = _icosa_vertices_xyz()
    for m, hp in enumerate(h):
        pxyz, vxyz = _pentagon_topo_verts_xyz(hp)
        k = vxyz.shape[0]
        # the pentagon's own icosa vertex + its 5 nearest fellows
        d2 = ((icosa - pxyz) ** 2).sum(axis=1)
        vi = int(d2.argmin())
        others = np.argsort(d2)[1:6]
        seq = []
        for i in range(k):
            a, b = vxyz[i], vxyz[(i + 1) % k]
            seq.append(a)
            n1 = np.cross(a, b)
            ab = math.acos(max(-1.0, min(1.0, float(a @ b))))
            best = None
            for j in others:
                w = icosa[j]
                n2 = np.cross(icosa[vi], w)
                d = np.cross(n1, n2)
                nd = np.linalg.norm(d)
                if nd < 1e-15:
                    continue
                d = d / nd
                if d @ (a + b) < 0:
                    d = -d
                # strictly inside the boundary arc ...
                da = math.acos(max(-1.0, min(1.0, float(a @ d))))
                db = math.acos(max(-1.0, min(1.0, float(b @ d))))
                if abs(da + db - ab) > 1e-9:
                    continue
                # ... and inside the icosa edge arc
                vw = math.acos(max(-1.0, min(1.0,
                                             float(icosa[vi] @ w))))
                dv = math.acos(max(-1.0, min(1.0,
                                             float(icosa[vi] @ d))))
                dw = math.acos(max(-1.0, min(1.0, float(w @ d))))
                if abs(dv + dw - vw) > 1e-9:
                    continue
                if min(da, db) < 1e-9:  # coincides with a topo vertex
                    continue
                best = d
                break
            if best is not None:
                seq.append(best)
        n = len(seq)
        for i, v in enumerate(seq):
            verts_out[m, i] = _xyz_to_deg(v)
        verts_out[m, n:] = verts_out[m, n - 1]
        n_out[m] = n
    return verts_out, n_out


def polyfill_candidates(lat_min, lat_max, lng_min, lng_max, res,
                        max_samples=20_000_000):
    """all cells whose centroid might lie in the given bbox: dense sample
    grid at <= half-inradius spacing, re-indexed and deduplicated.

    The sampling spacing guarantees every cell intersecting the bbox
    contains at least one sample point, so the returned set is a superset
    of every centroid-in-region polyfill. This is also the distributed
    strategy: partition the sample grid across executors.
    """
    r_km = min_inradius_km(res)
    step_lat = r_km / 111.32 * 0.99
    max_abs = min(max(abs(lat_min), abs(lat_max)), 89.9)
    step_lng = step_lat / max(math.cos(math.radians(max_abs)), 0.02)
    lats = np.arange(lat_min - step_lat, lat_max + step_lat, step_lat)
    lngs = np.arange(lng_min - step_lng, lng_max + step_lng, step_lng)
    if lats.size * lngs.size > max_samples:
        raise ValueError(
            f"polyfill sample grid too large ({lats.size * lngs.size}); "
            "distribute via operators.polyfill_distributed")
    LA, LO = np.meshgrid(lats, lngs, indexing="ij")
    cells = latlng_to_cell(LA.ravel(), LO.ravel(), res)
    return np.unique(cells)


# ---------------------------------------------------------------------------
# compact / uncompact (public H3 API: lossless cell-set compression)
# ---------------------------------------------------------------------------

def pentagon_cells(res):
    """the 12 pentagon cells at `res` (center-digit chains of the
    pentagonal base cells)."""
    bc = PENTAGON_BASE_CELLS.astype(np.uint64)
    h = np.full(bc.shape, _H3_MODE_CELL, dtype=np.uint64)
    h |= np.uint64(res) << _RES_SHIFT
    h |= bc << _BC_SHIFT
    for r in range(1, 16):
        if r > res:
            h |= np.uint64(7) << np.uint64((15 - r) * 3)
    return h


def cell_to_children(h, child_res):
    """all descendants of each cell at `child_res` (pentagon cells
    have 6 children — digit 1 is the deleted subsequence). Vectorized
    level-by-level expansion; accepts mixed input resolutions."""
    work = np.asarray(h, dtype=np.uint64).ravel()
    if (get_resolution(work) > child_res).any():
        raise ValueError("cell_to_children: cell finer than child_res")
    done = [work[get_resolution(work) == child_res]]
    work = work[get_resolution(work) < child_res]
    while len(work):
        res = get_resolution(work).astype(np.uint64)
        pent = is_pentagon(work)
        digs = np.tile(np.arange(7, dtype=np.uint64), len(work))
        mask = np.ones((len(work), 7), dtype=bool)
        mask[pent, 1] = False
        par = np.repeat(work, 7)[mask.ravel()]
        digs = digs[mask.ravel()]
        newres = np.repeat(res + np.uint64(1), 7)[mask.ravel()]
        shift = (np.uint64(15) - newres) * np.uint64(3)
        child = (par & ~(np.uint64(0xF) << _RES_SHIFT)) \
            | (newres << _RES_SHIFT)
        child = (child & ~(np.uint64(7) << shift)) | (digs << shift)
        at = get_resolution(child) == child_res
        done.append(child[at])
        work = child[~at]
    return np.concatenate(done) if done else work


def compact_cells(cells):
    """lossless set compression: any complete sibling group (7
    children; 6 for a pentagon parent) is replaced by its parent,
    cascading to res 0. Input cells must be distinct-able and
    non-overlapping (no cell an ancestor of another); output covers
    exactly the same area in the fewest cells."""
    cur = np.unique(np.asarray(cells, dtype=np.uint64))
    out = []
    for r in range(15, 0, -1):
        res = get_resolution(cur)
        at_r = cur[res == r]
        rest = cur[res != r]
        if len(at_r) == 0:
            cur = rest
            continue
        par = cell_to_parent(at_r, r - 1)
        upar, inv, counts = np.unique(par, return_inverse=True,
                                      return_counts=True)
        need = np.where(is_pentagon(upar), 6, 7)
        full = counts >= need
        out.append(at_r[~full[inv]])
        cur = np.unique(np.concatenate([rest, upar[full]])) \
            if full.any() else rest
    out.append(cur)
    return np.unique(np.concatenate(out))


def uncompact_cells(cells, res):
    """inverse of compact_cells: expand every cell to its descendants
    at `res` (identity for cells already at `res`)."""
    return np.unique(cell_to_children(cells, res))
