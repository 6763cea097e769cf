"""One-shot fitting of the pentagon forward-direction conventions.

The hexagon tables are derived geometrically and validated against golden
vectors; pentagon base cells have two remaining conventions the goldens
cannot reach (no golden data near any pentagon):

* ``slot_rot`` for each of the pentagon's 5 surrounding faces, and
* the cw-offset face set used by the leading-K digit adjustment.

The inverse direction (cell -> centroid) is fully determined by the home
FaceIJK + the published overage algorithm and was validated to be
geometrically sound (all 2+120*7^r cells distinct at res 1..3, uniform
nearest-neighbor spacing). That makes the inverse usable as ground truth:
for each (pentagon, face) we pick the (rot, cw) pair - 12 candidates -
under which latlng_to_cell(cell_to_latlng(c)) == c for every descendant
whose closest face is that face.

Run:  python -m osc_geo_h3grid_srv_spark.functions._h3_pentfit
and paste the printed table into h3core.py (_PENT_SLOT_OVERRIDES).
"""

from __future__ import annotations

import numpy as np

from . import h3core as h


def enumerate_descendants(bc: int, res: int) -> np.ndarray:
    ids = []

    def rec(digs):
        if len(digs) == res:
            ids.append(tuple(digs))
            return
        central = all(d == 0 for d in digs)
        for d in range(7):
            if central and d == 1:
                continue
            rec(digs + [d])

    rec([])
    digits = np.zeros((len(ids), 15), dtype=np.int8)
    for n, ds in enumerate(ids):
        digits[n, : len(ds)] = ds
    return h._pack(res, np.full(len(ids), bc, dtype=np.uint64), digits)


def fit(res: int = 4) -> dict:
    out = {}
    for bc in h._PENT_LIST:
        ids = enumerate_descendants(bc, res)
        la, lo = h.cell_to_latlng(ids)
        xyz = h._geo_to_xyz(np.radians(la), np.radians(lo))
        face = h._closest_face(xyz)
        for f in np.unique(face):
            sel = face == f
            best = None
            for rot in range(6):
                for cw in (False, True):
                    # temporarily patch tables: slot rot for bc on face f,
                    # and whether f is a cw-offset face of bc
                    slots = np.argwhere(h._T.slot_bc[f] == bc)
                    old = [(tuple(s), int(h._T.slot_rot[f][tuple(s)])) for s in slots]
                    for s in slots:
                        h._T.slot_rot[f][tuple(s)] = rot
                    oldcw = h._T.bc_cw_offset[bc].copy()
                    h._T.bc_cw_offset[bc] = np.array([f, -1]) if cw \
                        else np.array([-1, -1])
                    rt = h.latlng_to_cell(la[sel], lo[sel], res)
                    n_bad = int((rt != ids[sel]).sum())
                    # restore
                    for (s, r0) in old:
                        h._T.slot_rot[f][s] = r0
                    h._T.bc_cw_offset[bc] = oldcw
                    if best is None or n_bad < best[0]:
                        best = (n_bad, rot, cw)
            out[(bc, int(f))] = best
    return out


if __name__ == "__main__":
    res = 4
    result = fit(res)
    print("# fitted (bc, face) -> (residual_bad, rot, cw)")
    ok = True
    for (bc, f), (bad, rot, cw) in sorted(result.items()):
        flag = "" if bad == 0 else "   <-- UNRESOLVED"
        if bad:
            ok = False
        print(f"({bc:3d}, {f:2d}): ({rot}, {int(cw)}),  # bad={bad}{flag}")
    print("# all consistent" if ok else "# SOME UNRESOLVED")
