"""Product quantization: codebook completeness, encoding determinism,
and exact ADC behavior on constructed cluster data.

Fixture note: codebook seeds are the lowest ``n_codes`` vec_ids, so
the cluster fixture assigns vec_id i to cluster ``i % n_clusters`` —
the seed set then spans every cluster and one Lloyd step recovers the
exact centers (identical copies make the update a fixed point), which
makes ADC distances exactly 0 within a cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.operators.pq import knn_pq, pq_codebooks, pq_encode


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _cluster_vectors(n_total, centers, dim):
    """vec_id i -> an exact copy of center ``i % len(centers)``."""
    pts = []
    for c in centers:
        base = [0.0] * dim
        base[c % dim] = float(c + 1)
        pts.append(base)
    return [(i, pts[i % len(centers)]) for i in range(n_total)]


def test_codebooks_complete_and_integer(spark):
    df = _vecs(spark, _cluster_vectors(12, [0, 1, 2], dim=8))
    cb = pq_codebooks(df, m=2, n_codes=4, dim=8).collect()
    # full grid even if some codewords attract nothing: 2 subs x 4 codes x 4 dims
    assert len(cb) == 2 * 4 * 4
    assert all(isinstance(r["c_unit"], int) for r in cb)


def test_encode_m_codes_per_vector_in_range(spark):
    df = _vecs(spark, _cluster_vectors(6, [0, 1], dim=8))
    cb = pq_codebooks(df, m=2, n_codes=4, dim=8)
    codes = pq_encode(df, cb, m=2, n_codes=4, dim=8).collect()
    assert len(codes) == 6 * 2
    assert all(0 <= r["code"] < 4 for r in codes)
    # identical vectors must get identical codes (cluster 0 = ids 0,2,4)
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], {})[r["sub"]] = r["code"]
    assert by_vec[0] == by_vec[2] == by_vec[4]


def test_adc_ranks_same_cluster_first(spark):
    # 3 exact clusters over 15 ids (round-robin): same-cluster
    # neighbors sit at ADC distance 0 and fill the top ranks
    df = _vecs(spark, _cluster_vectors(15, [0, 1, 2], dim=8))
    res = knn_pq(
        df, df.filter(F.col("vec_id") < 3), k=4, m=2, n_codes=4, dim=8
    ).collect()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_dist"])
        )
    # query 0 is cluster 0 = ids {0,3,6,9,12}: neighbors 3,6,9,12, d=0
    top0 = sorted(got[0])
    assert [n for _, n, _ in top0] == [3, 6, 9, 12]
    assert all(d == 0 for _, _, d in top0)
    # query 2 is cluster 2 = ids {2,5,8,11,14}
    top2 = sorted(got[2])
    assert [n for _, n, _ in top2] == [5, 8, 11, 14]
    assert all(d == 0 for _, _, d in top2)


def test_pretrained_codebook_reuse_identical(spark):
    df = _vecs(spark, _cluster_vectors(16, [0, 1, 2, 3], dim=8))
    q = df.filter(F.col("vec_id") < 2)
    cb = pq_codebooks(df, m=2, n_codes=4, dim=8)
    a = sorted(map(tuple, knn_pq(df, q, k=3, m=2, n_codes=4, dim=8).collect()))
    b = sorted(
        map(
            tuple,
            knn_pq(df, q, k=3, m=2, n_codes=4, dim=8, codebooks=cb).collect(),
        )
    )
    assert a == b


def test_fewer_vectors_than_codes(spark):
    df = _vecs(spark, _cluster_vectors(2, [0, 1], dim=8))  # 2 vecs, 4 codes
    cb = pq_codebooks(df, m=2, n_codes=4, dim=8)
    assert cb.count() == 2 * 2 * 4  # only 2 seeds exist -> 2 codes
    res = knn_pq(df, df, k=1, m=2, n_codes=4, dim=8).collect()
    assert {r["query_id"] for r in res} == {0, 1}
