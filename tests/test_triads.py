"""Triad census: classifier representatives + permutation invariance,
brute-force parity on random digraphs, census-total identity."""

from __future__ import annotations

import random
from itertools import combinations

from crgp_spark.operators.triads import (
    TRIAD_NAMES,
    _check_table,
    _classify,
    triad_census,
)

# hand-written representatives straight from the documented drawings
# (A,B,C = 0,1,2) — independent of the generated 64-state table
REPS = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)],
    "021U": [(0, 1), (2, 1)],
    "021C": [(0, 1), (1, 2)],
    "111D": [(0, 1), (1, 0), (2, 1)],
    "111U": [(0, 1), (1, 0), (1, 2)],
    "030T": [(0, 1), (2, 1), (0, 2)],
    "030C": [(1, 0), (2, 1), (0, 2)],
    "201": [(0, 1), (1, 0), (0, 2), (2, 0)],
    "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],
    "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],
    "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],
    "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],
    "300": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)],
}


def test_classifier_names_every_documented_representative():
    for name, arcs in REPS.items():
        assert _classify(frozenset(arcs)) == name


def test_state_table_is_relabeling_invariant():
    _check_table()


def _census(spark, arcs, **kw):
    df = spark.createDataFrame(sorted(arcs), "src long, dst long")
    return {
        r["tclass"]: r["n_triads"]
        for r in triad_census(df, **kw).collect()
    }


def _brute(arcs, verts):
    cen = {c: 0 for c in TRIAD_NAMES}
    for t in combinations(sorted(verts), 3):
        idx = {v: i for i, v in enumerate(t)}
        sub = frozenset(
            (idx[s], idx[d]) for s, d in arcs if s in idx and d in idx
        )
        cen[_classify(sub)] += 1
    return cen


def test_known_small_graphs(spark):
    # directed 3-cycle
    got = _census(spark, [(1, 2), (2, 3), (3, 1)])
    assert got["030C"] == 1 and sum(got.values()) == 1
    # transitive triple
    got = _census(spark, [(1, 2), (2, 3), (1, 3)])
    assert got["030T"] == 1
    # complete mutual K4: every one of the C(4,3)=4 triples is 300
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    got = _census(spark, k4)
    assert got["300"] == 4 and sum(got.values()) == 4


def test_matches_bruteforce_on_random_digraphs(spark):
    random.seed(11)
    for _ in range(2):
        arcs = {
            (s, d)
            for s in range(11)
            for d in range(11)
            if s != d and random.random() < 0.2
        }
        verts = {v for a in arcs for v in a}
        got = _census(spark, arcs)
        assert got == _brute(arcs, verts)
        n = len(verts)
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_connected_only_mode(spark):
    got = _census(
        spark, [(1, 2), (2, 3), (3, 1)], include_disconnected=False
    )
    assert set(got) == set(TRIAD_NAMES) - {"003", "012", "102"}
    assert got["030C"] == 1


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _census(spark, [(1, 2), (1, 2), (1, 1), (2, 3), (3, 1)])
    assert got["030C"] == 1
