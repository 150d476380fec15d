from __future__ import annotations

import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.temporalreach import earliest_arrival, temporal_edges


def _cfg(tmp_path):
    return EngineConfig(
        graph_partitions=4,
        shuffle_partitions=8,
        checkpoint_dir=str(tmp_path),
    )


def _python_reference(edges, seeds):
    """Dominance-frontier Dijkstra-ish reference: repeatedly relax
    every edge against the current best arrivals until nothing
    improves. O(V·E) worst case — fine for fixtures."""
    arr = {s: 0 for s in seeds}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            if u in arr and t >= arr[u] and t < arr.get(v, float("inf")):
                arr[v] = t
                changed = True
    return arr


def _run(spark, tmp_path, edges, seeds):
    e = spark.createDataFrame(edges, "src long, dst long, t long")
    s = spark.createDataFrame([(x,) for x in seeds], "vid long")
    got = {
        r.vid: r.arrival_us
        for r in earliest_arrival(spark, e, s, _cfg(tmp_path)).collect()
    }
    return got


def test_decreasing_time_blocks_path(spark, tmp_path):
    """a->b at t=10 then b->c at t=5: c is STATICALLY reachable but not
    temporally — the defining difference from BFS/components."""
    got = _run(spark, tmp_path, [(1, 2, 10), (2, 3, 5)], [1])
    assert got == {1: 0, 2: 10}


def test_increasing_chain_fully_reachable(spark, tmp_path):
    got = _run(
        spark, tmp_path, [(1, 2, 10), (2, 3, 20), (3, 4, 30)], [1]
    )
    assert got == {1: 0, 2: 10, 3: 20, 4: 30}


def test_equal_time_hop_allowed(spark, tmp_path):
    """t >= arrival: an edge at exactly the arrival instant is
    traversable (matches the oracle's >= and session_window's
    merge-at-boundary convention)."""
    got = _run(spark, tmp_path, [(1, 2, 10), (2, 3, 10)], [1])
    assert got == {1: 0, 2: 10, 3: 10}


def test_late_direct_vs_early_indirect(spark, tmp_path):
    """Direct edge at t=100 vs two-hop path arriving at t=30: minimum
    arrival wins, and the improved label re-propagates (4 gets 40 via
    the indirect arrival, not 100)."""
    edges = [
        (1, 4, 100),
        (1, 2, 10),
        (2, 4, 30),
        (4, 5, 40),
    ]
    got = _run(spark, tmp_path, edges, [1])
    assert got == {1: 0, 2: 10, 4: 30, 5: 40}


def test_seed_wins_over_message(spark, tmp_path):
    """A seed keeps arrival 0 even when in-edges would assign later."""
    got = _run(spark, tmp_path, [(1, 2, 10), (2, 1, 20)], [1, 2])
    assert got == {1: 0, 2: 0}


@pytest.mark.parametrize("seed", [7, 8])
def test_matches_python_reference(spark, tmp_path, seed):
    """Deterministic pseudo-random temporal graphs vs the relaxation
    reference — cycles included (temporal cycles terminate naturally:
    arrivals only decrease)."""
    import hashlib

    def h(*xs):
        s = ":".join(map(str, xs)).encode()
        return int(hashlib.md5(s).hexdigest()[:8], 16)

    n, m = 40, 160
    edges = []
    for i in range(m):
        u = h(seed, i, "u") % n
        v = h(seed, i, "v") % n
        t = h(seed, i, "t") % 50
        if u != v:
            edges.append((u, v, t))
    seeds = [x for x in range(n) if x % 11 == 0]
    got = _run(spark, tmp_path / str(seed), edges, seeds)
    assert got == _python_reference(edges, seeds)


def test_temporal_edges_derivation(spark, tmp_path):
    """temporal_edges: per-channel LEAD order, self-successions
    dropped, t = the FOLLOWING event's micros."""
    import datetime as dt

    rows = [
        (0, dt.datetime(2024, 1, 1, 0, 0, 0), 10, "a"),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 11, "a"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 2), 11, "a"),  # self: dropped
        (3, dt.datetime(2024, 1, 1, 0, 0, 3), 12, "a"),
        (4, dt.datetime(2024, 1, 1, 0, 0, 4), 13, "b"),  # b has 1 event: no edge
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = {
        (r.src, r.dst, r.t) for r in temporal_edges(events).collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    assert got == {
        (10, 11, base + 1_000_000),
        (11, 12, base + 3_000_000),
    }


def test_seed_release_times(spark, tmp_path):
    """Seeds with explicit arrival (release-time semantics): an edge
    BEFORE the seed's release is not traversable; a seed reached
    earlier by another seed improves."""
    e = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 50), (1, 4, 100)], "src long, dst long, t long"
    )
    s = spark.createDataFrame(
        [(1, 5), (4, 20)], "vid long, arrival long"
    )
    got = {
        r.vid: r.arrival_us
        for r in earliest_arrival(spark, e, s, _cfg(tmp_path)).collect()
    }
    # 1 releases at 5 -> takes (1,2,10) and (1,4,100); 4's own release
    # 20 beats the t=100 arrival; 2 at 10 takes (2,3,50)
    assert got == {1: 5, 2: 10, 3: 50, 4: 20}


def test_budget_exhaustion_raises(spark, tmp_path):
    """A long strictly-increasing chain with a tiny superstep budget
    raises loudly instead of returning a partial frontier."""
    e = spark.createDataFrame(
        [(i, i + 1, 10 * (i + 1)) for i in range(12)], "src long, dst long, t long"
    )
    s = spark.createDataFrame([(0,)], "vid long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        earliest_arrival(spark, e, s, _cfg(tmp_path), max_supersteps=3)
