"""Hypothesis property tests for the session's graph operators: MIS
set-properties and generic-vs-kernel harmonic agreement on arbitrary
small graphs (SURVEY.md §5 strategy (5) extended to the new family)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from crgp_spark.config import EngineConfig
from crgp_spark.operators import harmonic as H
from crgp_spark.operators.mis import maximal_independent_set


def _cfg(tag):
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir=f"/tmp/crgp_ckpt_prop_{tag}")


_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_mis_properties_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = maximal_independent_set(
        spark, df, rounds=10, cfg=_cfg("mis")
    ).collect()
    status = {r["vid"]: r["status"] for r in rows}
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    # output covers exactly the non-isolated vertices
    assert set(status) == set(adj)
    # 10 rounds drains any 13-vertex graph (expected O(log n))
    assert "open" not in status.values()
    mis = {v for v, s in status.items() if s == "mis"}
    for v in mis:
        assert not (adj[v] & mis)  # independence
    for v, s in status.items():
        if s == "out":
            assert adj[v] & mis  # maximality (dominated)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, radius=st.integers(1, 3))
def test_harmonic_kernel_equals_generic(spark, edges, radius):
    # single-conversation input: kernel path vs distributed level sets
    rows = [(s, d, "c0") for s, d in edges]
    df = spark.createDataFrame(rows, "src long, dst long, conv_id string")
    a = sorted(map(tuple, H.cascade_harmonic(
        spark, df, radius=radius, cfg=_cfg("harm")).collect()))
    b = sorted(map(tuple, H.harmonic_bounded(
        spark, df.select("src", "dst"), radius=radius,
        cfg=_cfg("harm")).collect()))
    assert a == b
