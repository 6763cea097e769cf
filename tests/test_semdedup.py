"""SemDeDup embedding-cluster pruning vs an independent NumPy replay
(operators/semdedup.py)."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators import semdedup
from osc_geo_h3grid_srv_spark.operators.similarity import (
    ivf_refine, ivf_seed_centroids)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_semdedup(pdf, C, eps):
    V = np.stack(pdf["embedding"].map(np.asarray).values).astype(
        np.float64)
    ids = pdf["vec_id"].to_numpy()
    d = V @ np.asarray(C).T
    cl = d.argmax(1)
    nv = np.linalg.norm(V, axis=1)
    cc = np.round(d[np.arange(len(V)), cl] / nv, 9)
    Vn = V / nv[:, None]
    losers = set()
    for c in set(cl.tolist()):
        idx = np.where(cl == c)[0]
        S = Vn[idx] @ Vn[idx].T
        for ii in range(len(idx)):
            for jj in range(ii + 1, len(idx)):
                i, j = idx[ii], idx[jj]
                if round(S[ii, jj], 6) >= eps:
                    lose = (i if (cc[i], ids[i]) > (cc[j], ids[j])
                            else j)
                    losers.add(ids[lose])
    return cl, cc, losers, ids


def test_semdedup_vs_numpy(emb):
    C = ivf_seed_centroids(64, 8)
    eps = 0.3
    out = semdedup.semdedup_prune(emb, C, eps=eps).toPandas()
    cl, cc, losers, ids = _numpy_semdedup(emb.toPandas(), C, eps)
    got = out.set_index("vec_id")
    by_id = {ids[i]: i for i in range(len(ids))}
    for vid, row in got.iterrows():
        i = by_id[vid]
        assert row["cluster"] == cl[i]
        assert row["centroid_cos"] == pytest.approx(cc[i], abs=1e-12)
        assert row["kept"] == (vid not in losers)
    # the rule must actually prune something at this eps, and never
    # everything (an empty kept set means the keep rule inverted)
    n_kept = int(got["kept"].sum())
    assert 0 < len(losers) and 0 < n_kept < len(got)


def test_semdedup_keep_rule_direction(spark):
    # two near-identical vectors in one cluster: the one FARTHER from
    # the centroid (lower centroid_cos) must survive
    C = ivf_seed_centroids(4, 2)
    c0 = C[0]
    rows = [
        (1, [float(x) for x in c0]),            # exactly on centroid
        (2, [float(x) for x in c0 * 0.9 + 0.05]),  # near c0, tilted off
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = (semdedup.semdedup_prune(emb, C, eps=0.9)
           .toPandas().set_index("vec_id"))
    if bool(out["kept"].all()):
        pytest.skip("vectors landed in different clusters")
    assert not bool(out.loc[1, "kept"])   # closest to centroid pruned
    assert bool(out.loc[2, "kept"])


def test_semdedup_refined_centroids(emb):
    # the operator composes with Lloyd-refined centroids: the kept set
    # stays consistent with the replay on the refined literals
    C0 = ivf_seed_centroids(64, 8)
    C = ivf_refine(emb, C0, iters=2)
    eps = 0.3
    out = semdedup.semdedup_prune(emb, C, eps=eps).toPandas()
    cl, cc, losers, ids = _numpy_semdedup(emb.toPandas(), C, eps)
    got_losers = set(out.loc[~out["kept"], "vec_id"].tolist())
    assert got_losers == losers
