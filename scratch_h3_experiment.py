"""Experiment: derive H3 base-cell layout geometrically from the published
icosahedron constants, and test numbering hypotheses against golden vectors
extracted from the reference's example databases.

H3 algorithm facts used here are public (Uber H3, Apache-2.0, published spec):
- 20 icosahedron face centers (lat,lng radians), faceijk.c
- face axis azimuths (Class II i/j/k axes), faceijk.c
- gnomonic projection per face, aperture-7 hex grid, Class II/III alternation
"""
import json
import math

import numpy as np

# icosahedron face centers in (lat, lng) radians -- public H3 constants
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

# azimuth from face center to each of the face's 3 vertices (ccw i/j/k axes)
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
M_AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))  # ~0.333473172251832
RES0_U_GNOMONIC = 0.38196601125010500003


def geo_to_xyz(lat, lng):
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


FACE_CENTER_XYZ = geo_to_xyz(FACE_CENTER_GEO[:, 0], FACE_CENTER_GEO[:, 1])


def validate_icosahedron():
    dots = FACE_CENTER_XYZ @ FACE_CENTER_XYZ.T
    np.fill_diagonal(dots, -2)
    # adjacent face centers of an icosahedron: constant max dot
    mx = dots.max(axis=1)
    print("max dot per face (should be constant):", mx.min(), mx.max())
    adj_counts = (dots > mx.min() - 1e-9).sum(axis=1)
    print("adjacent counts (should be 3):", set(adj_counts.tolist()))
    # azimuth spacing: 120 degrees apart (ccw ordering)
    az = FACE_AXES_AZ_RADS_CII
    d01 = np.mod(az[:, 0] - az[:, 1], 2 * math.pi)
    d12 = np.mod(az[:, 1] - az[:, 2], 2 * math.pi)
    print("az col0-col1 spacing:", d01.min(), d01.max())
    print("az col1-col2 spacing:", d12.min(), d12.max())


def geo_azimuth(lat1, lng1, lat2, lng2):
    return np.arctan2(
        np.cos(lat2) * np.sin(lng2 - lng1),
        np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(lng2 - lng1),
    )


def closest_face(xyz):
    dots = xyz @ FACE_CENTER_XYZ.T
    return np.argmax(dots, axis=-1)


def geo_to_hex2d(lat, lng, res):
    """project points to (face, x, y) in the face-local res-scaled hex plane."""
    xyz = geo_to_xyz(lat, lng)
    face = closest_face(xyz)
    fclat = FACE_CENTER_GEO[face, 0]
    fclng = FACE_CENTER_GEO[face, 1]
    dot = np.clip((xyz * FACE_CENTER_XYZ[face]).sum(axis=-1), -1, 1)
    r = np.arccos(dot)
    az = geo_azimuth(fclat, fclng, lat, lng)
    theta = np.mod(FACE_AXES_AZ_RADS_CII[face, 0] - np.mod(az, 2 * math.pi), 2 * math.pi)
    if res % 2 == 1:  # Class III
        theta = np.mod(theta - M_AP7_ROT_RADS, 2 * math.pi)
    rg = np.tan(r) / RES0_U_GNOMONIC * (M_SQRT7 ** res)
    x = rg * np.cos(theta)
    y = rg * np.sin(theta)
    x = np.where(r < 1e-16, 0.0, x)
    y = np.where(r < 1e-16, 0.0, y)
    return face, x, y


def hex2d_to_ijk(x, y):
    """vectorized _hex2dToCoordIJK: hex grid rounding. returns normalized ijk."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    k = np.zeros_like(x)
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / math.sin(math.pi / 3.0)
    x1 = a1 + x2 / 2.0
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2
    i = np.zeros_like(m1)
    j = np.zeros_like(m1)
    # r1 < 0.5 branch
    c_lo = r1 < 0.5
    c_lo1 = c_lo & (r1 < 1.0 / 3.0)
    i = np.where(c_lo1 & (r2 < (1.0 + r1) / 2.0), m1, i)
    j = np.where(c_lo1 & (r2 < (1.0 + r1) / 2.0), m2, j)
    i = np.where(c_lo1 & ~(r2 < (1.0 + r1) / 2.0), m1, i)
    j = np.where(c_lo1 & ~(r2 < (1.0 + r1) / 2.0), m2 + 1, j)
    c_lo2 = c_lo & ~(r1 < 1.0 / 3.0)
    i = np.where(c_lo2, np.where(r2 < (1.0 - r1), m1, np.where(r2 > 2.0 * r1 - 1.0, m1, m1 + 1)), i)
    j = np.where(c_lo2, np.where(r2 < (1.0 - r1), m2, np.where(r2 > 2.0 * r1 - 1.0, m2 + 1, m2)), j)
    # careful: replicate exact C branching below instead
    # --- redo exactly ---
    i = np.zeros_like(m1)
    j = np.zeros_like(m1)
    b_r1_lt_half = r1 < 0.5
    b_r1_lt_third = r1 < 1.0 / 3.0
    b1 = b_r1_lt_half & b_r1_lt_third
    cond1 = r2 < (1.0 + r1) / 2.0
    i = np.where(b1, m1, i)
    j = np.where(b1, np.where(cond1, m2, m2 + 1), j)
    b2 = b_r1_lt_half & ~b_r1_lt_third
    cond2a = r2 < (1.0 - r1)
    cond2b = (1.0 - r1) <= r2
    cond2c = r2 < (2.0 * r1)
    j = np.where(b2, np.where(cond2a, m2, m2 + 1), j)
    i = np.where(b2, np.where(cond2b & cond2c, m1 + 1, m1), i)
    b_r1_ge_half = ~b_r1_lt_half
    b3 = b_r1_ge_half & (r1 < 2.0 / 3.0)
    cond3a = r2 < (1.0 - r1)
    cond3b = r2 > (2.0 * r1 - 1.0)
    j = np.where(b3, np.where(cond3a, m2, m2 + 1), j)
    i = np.where(b3, np.where(cond3b & ~cond3a, m1, np.where(cond3a, m1, m1 + 1)), i)
    # that last line wrong; do exact:
    # if r1 >= 0.5 and r1 < 2/3: if r2 < 1-r1: j=m2 else j=m2+1 ; if 2r1-1 < r2 and r2 < 1-r1: i=m1 else i=m1+1
    i = np.where(b3, np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1), m1, m1 + 1), i)
    b4 = b_r1_ge_half & ~(r1 < 2.0 / 3.0)
    cond4 = r2 < (r1 / 2.0)
    i = np.where(b4, m1 + 1, i)
    j = np.where(b4, np.where(cond4, m2, m2 + 1), j)
    # fold negative axes
    neg_x = x < 0.0
    j_odd = (j % 2) == 1
    axis_i = np.where(neg_x & ~j_odd, 1.0, 0.0)  # placeholder
    # exact C:
    # if x < 0: if j % 2 == 0: i = -i + 2*ceil? ... replicate:
    diff_even = i - (2 * ((i - j // 1) ))  # unused
    i2 = i.copy()
    # from C code:
    # if (x < 0.0) { if (j % 2 == 0) { long axisi = j / 2; long diff = i - axisi; i = i - 2*diff; } else { long axisi = (j+1)/2; long diff = i - axisi; i = i - (2*diff + 1);} }
    axisi_e = j // 2
    diff_e = i - axisi_e
    axisi_o = (j + 1) // 2
    diff_o = i - axisi_o
    i2 = np.where(neg_x & ((j % 2) == 0), i - 2 * diff_e, i2)
    i2 = np.where(neg_x & ((j % 2) != 0), i - (2 * diff_o + 1), i2)
    i = i2
    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)
    return normalize_ijk(i, j, k.astype(np.int64))


def normalize_ijk(i, j, k):
    # remove negatives: standard _ijkNormalize
    i = np.asarray(i, dtype=np.int64).copy()
    j = np.asarray(j, dtype=np.int64).copy()
    k = np.asarray(k, dtype=np.int64).copy()
    mask = i < 0
    j = np.where(mask, j - i, j)
    k = np.where(mask, k - i, k)
    i = np.where(mask, 0, i)
    mask = j < 0
    i = np.where(mask, i - j, i)
    k = np.where(mask, k - j, k)
    j = np.where(mask, 0, j)
    mask = k < 0
    i = np.where(mask, i - k, i)
    j = np.where(mask, j - k, j)
    k = np.where(mask, 0, k)
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def ijk_to_hex2d(i, j, k):
    i = np.asarray(i, dtype=np.float64)
    j = np.asarray(j, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    x = (i - k) - 0.5 * (j - k)
    y = (j - k) * math.sin(math.pi / 3.0)
    return x, y


def hex2d_to_geo(face, x, y, res):
    """inverse gnomonic from face-local scaled hex plane to (lat,lng)."""
    r = np.sqrt(x * x + y * y)
    theta = np.arctan2(y, x)
    r = r / (M_SQRT7 ** res) * RES0_U_GNOMONIC
    rr = np.arctan(r)
    if res % 2 == 1:
        theta = theta + M_AP7_ROT_RADS
    az = np.mod(FACE_AXES_AZ_RADS_CII[face, 0] - theta, 2 * math.pi)
    fclat = FACE_CENTER_GEO[face, 0]
    fclng = FACE_CENTER_GEO[face, 1]
    # geo point at azimuth az, distance rr from face center (sphere)
    lat = np.arcsin(np.sin(fclat) * np.cos(rr) + np.cos(fclat) * np.sin(rr) * np.cos(az))
    lng = fclng + np.arctan2(
        np.sin(az) * np.sin(rr) * np.cos(fclat),
        np.cos(rr) - np.sin(fclat) * np.sin(lat),
    )
    zero = rr < 1e-16
    lat = np.where(zero, fclat, lat)
    lng = np.where(zero, fclng, lng)
    lng = np.mod(lng + math.pi, 2 * math.pi) - math.pi
    return lat, lng


def derive_base_cells():
    """enumerate (face, i, j, k) in 0..2^3, keep only lattice slots OWNED by
    their face (unprojected center's closest face == face, ties -> lowest
    face index, which is how argmax breaks ties), group into base cells."""
    faces, iis, jjs, kks = [], [], [], []
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    faces.append(f); iis.append(i); jjs.append(j); kks.append(k)
    faces = np.array(faces); iis = np.array(iis); jjs = np.array(jjs); kks = np.array(kks)
    x, y = ijk_to_hex2d(iis, jjs, kks)
    lat, lng = hex2d_to_geo(faces, x, y, 0)
    xyz = geo_to_xyz(lat, lng)
    dots = xyz @ FACE_CENTER_XYZ.T
    best = dots.max(axis=1)
    owned = dots[np.arange(len(faces)), faces] > best - 1e-9  # face is (tied-)closest
    centers = []  # list of (lat, lng, xyz, [(f,i,j,k) owner slots])
    for idx in range(len(faces)):
        if not owned[idx]:
            continue
        found = None
        for c in centers:
            if np.abs(c[2] - xyz[idx]).max() < 1e-6:
                found = c
                break
        if found is None:
            centers.append([lat[idx], lng[idx], xyz[idx], []])
            found = centers[-1]
        found[3].append((int(faces[idx]), int(iis[idx]), int(jjs[idx]), int(kks[idx])))
    print("distinct owned centers:", len(centers))
    return centers


if __name__ == "__main__":
    validate_icosahedron()
    centers = derive_base_cells()
    # sort by latitude desc; tiebreak by lng asc
    centers.sort(key=lambda c: (-c[0], c[1]))
    pents = [n for n, c in enumerate(centers) if len(c[3]) >= 5]
    print("pentagon numbers (latitude-sorted):", pents)
    print("slot-count histogram:", {m: sum(1 for c in centers if len(c[3]) == m) for m in range(1, 7)})
    # anchors: jamaica (17.973646,-76.790727) -> bc 51 ; germany cell centroid
    # (51.12859, 14.995805) -> bc 15 ; SF (37.77,-122.42) -> bc 20 (soft)
    for (plat, plng, expect) in [
        (17.973646, -76.790727, 51),
        (51.12859, 14.995805, 15),
        (37.77, -122.42, 20),
        (0.0, 0.0, None),
    ]:
        lat = math.radians(plat); lng = math.radians(plng)
        f, x, y = geo_to_hex2d(np.array([lat]), np.array([lng]), 0)
        i, j, k = hex2d_to_ijk(x, y)
        xx, yy = ijk_to_hex2d(i, j, k)
        clat, clng = hex2d_to_geo(f, xx, yy, 0)
        cxyz = geo_to_xyz(clat, clng)[0]
        num = None
        for n, c in enumerate(centers):
            if np.abs(c[2] - cxyz).max() < 1e-6:
                num = n
                break
        print(f"point ({plat},{plng}) -> face {f[0]} ijk ({i[0]},{j[0]},{k[0]}) -> bc {num} (expect {expect})")
    # print top/bottom of the numbering for sanity
    for n in list(range(6)) + list(range(116, 122)):
        c = centers[n]
        print(n, "lat %.3f lng %.3f" % (math.degrees(c[0]), math.degrees(c[1])), "slots", c[3])
