"""SemDeDup semantic dedup: crafted-fixture semantics + numpy cross-check."""

from __future__ import annotations

import numpy as np
import pytest

from crgp_spark.operators.semdedup import semantic_dedup


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_exact_duplicate_dropped_keeps_lowest_id(spark):
    # ids 0/1 seed two far-apart centroids; 2 duplicates 0, 3 duplicates 1,
    # 4 is orthogonal to everything
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semantic_dedup(_df(spark, vecs), k=2, threshold=0.95).collect()
    }
    assert len(out) == 5
    assert out[0][1] and out[1][1]  # representatives kept
    assert not out[2][1] and not out[3][1]  # duplicates dropped
    assert out[4][1]  # orthogonal vector kept
    # duplicates landed in their representative's cluster
    assert out[2][0] == out[0][0] and out[3][0] == out[1][0]


def test_cross_cluster_pairs_never_compared(spark):
    # 2 and 3 are identical, but 3 sits (by construction of the seed
    # centroids 0/1) nearer the other centroid only if it actually is —
    # here both land in cluster of id 0, so craft instead: make the dup
    # pair straddle clusters via opposite signs on the second axis.
    vecs = [
        [1.0, 0.1, 0.0, 0.0],
        [-1.0, 0.1, 0.0, 0.0],
        [0.1, 1.0, 0.0, 0.0],  # assigned with seed 0 (closer to +1 side)
        [-0.1, 1.0, 0.0, 0.0],  # assigned with seed 1
    ]
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semantic_dedup(_df(spark, vecs), k=2, threshold=0.9).collect()
    }
    # 2 and 3 have cosine ~0.98 but sit in different clusters -> both kept
    assert out[2][0] != out[3][0]
    assert out[2][1] and out[3][1]


def _numpy_semdedup(vecs, k, tnum, scale=10_000):
    q = np.floor(np.asarray(vecs, dtype=np.float64) * scale + 0.5).astype(
        np.int64
    )
    cents = q[:k]
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cluster = (d * k + np.arange(k)[None, :]).min(axis=1) % k
    ss = (q * q).sum(axis=1)
    keep = np.ones(len(q), dtype=bool)
    for a in range(len(q)):
        for b in range(a + 1, len(q)):
            if cluster[a] != cluster[b]:
                continue
            dot = int(q[a] @ q[b])
            if dot > 0 and dot * dot * 10**8 >= tnum * tnum * int(
                ss[a]
            ) * int(ss[b]):
                keep[b] = False
    return cluster, keep


@pytest.mark.parametrize("threshold", [0.4, 0.8])
def test_matches_numpy_reference(spark, threshold):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant exact duplicates so something actually drops at 0.8
    vecs[30] = vecs[3]
    vecs[31] = vecs[7]
    vecs = vecs.round(4)
    cluster, keep = _numpy_semdedup(vecs, 4, int(threshold * 10_000))
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semantic_dedup(
            _df(spark, vecs), k=4, threshold=threshold
        ).collect()
    }
    assert got == {i: (int(cluster[i]), bool(keep[i])) for i in range(60)}
    if threshold == 0.8:
        assert not all(keep)  # the planted dups dropped


def test_threshold_validation(spark):
    with pytest.raises(ValueError):
        semantic_dedup(_df(spark, [[1.0, 0.0]]), threshold=0.0)
