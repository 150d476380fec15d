"""k-means step: numpy cross-check of assignment + integer-mean update."""

from __future__ import annotations

import numpy as np

from crgp_spark.operators.kmeans import kmeans_step


def _numpy_step(vecs, k, scale):
    q = np.floor(np.asarray(vecs, dtype=np.float64) * scale + 0.5).astype(
        np.int64
    )
    cents = q[:k]
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    comp = d * k + np.arange(k)[None, :]
    cluster = comp.min(axis=1) % k
    out = {}
    for j in range(k):
        members = q[cluster == j]
        if len(members) == 0:
            continue
        for dim in range(q.shape[1]):
            s = int(members[:, dim].sum())
            out[(j, dim)] = (
                int(np.floor(s / len(members) + 0.5)),
                len(members),
            )
    return out


def test_step_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 6)).round(3)  # negatives included
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(len(vecs))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["cluster"], r["dim"]): (r["c_unit"], r["n_members"])
        for r in kmeans_step(df, k=4, scale=1000).collect()
    }
    # quantize the float32-roundtripped values exactly as the engine does
    f32 = vecs.astype(np.float32).astype(np.float64)
    assert got == _numpy_step(f32, 4, 1000)


def test_tie_breaks_to_lowest_centroid(spark):
    # two identical centroids: every vector equidistant -> cluster 0
    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["cluster"] for r in kmeans_step(df, k=2, scale=100).collect()}
    assert got == {0}


def test_fit_one_iteration_equals_step(spark):
    import numpy as np

    from crgp_spark.operators.kmeans import kmeans_fit

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 5)).round(2)
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(len(vecs))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    a = sorted(map(tuple, kmeans_step(df, k=3, scale=1000).collect()))
    b = sorted(map(tuple, kmeans_fit(df, k=3, iterations=1, scale=1000).collect()))
    assert a == b


def test_fit_converges_on_separated_clusters(spark):
    from crgp_spark.operators.kmeans import kmeans_fit

    # two tight blobs far apart; k=2 must separate them regardless of
    # the (poor) lowest-id seed putting both seeds in blob A
    blob_a = [(i, [0.0 + i * 0.001, 0.0], 0) for i in range(10)]
    blob_b = [(100 + i, [10.0 + i * 0.001, 10.0], 0) for i in range(10)]
    df = spark.createDataFrame(
        blob_a + blob_b, "vec_id long, embedding array<float>, label int"
    )
    got = kmeans_fit(df, k=2, iterations=4, scale=1000).collect()
    sizes = {}
    for r in got:
        sizes[r["cluster"]] = r["n_members"]
    assert sorted(sizes.values()) == [10, 10]
