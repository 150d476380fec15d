"""Butterfly counting: hand-computed K(2,2)+tail, brute-force parity
on a seeded random membership, side-equality of the global count,
wedge-budget side selection, and the mega-group cap."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from crgp_spark.operators.butterfly import butterfly_counts, wedge_budget


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, p) for c, p in rows], "conv_id string, participant string"
    )


def _brute(rows, side):
    # membership sets per member of the counted side
    nbrs: dict[str, set] = {}
    for c, p in set(rows):
        v, g = (p, c) if side == "participant" else (c, p)
        nbrs.setdefault(v, set()).add(g)
    out = {}
    for v in nbrs:
        mates = wedges = bf = 0
        for w in nbrs:
            if w == v:
                continue
            s = len(nbrs[v] & nbrs[w])
            if s:
                mates += 1
                wedges += s
                bf += s * (s - 1) // 2
        out[v] = (mates, wedges, bf)
    return out


def test_k22_plus_tail(spark):
    # p1,p2 both in c1,c2 (one butterfly); p3 only in c1.
    rows = [("c1", "p1"), ("c1", "p2"), ("c2", "p1"), ("c2", "p2"),
            ("c1", "p3")]
    got = {
        r["participant"]: (r["n_mates"], r["wedges"], r["butterflies"])
        for r in butterfly_counts(_turns(spark, rows)).collect()
    }
    assert got == {"p1": (2, 3, 1), "p2": (2, 3, 1), "p3": (2, 2, 0)}
    # conversation side: c1,c2 share {p1,p2} -> one butterfly each
    gotc = {
        r["conv_id"]: (r["n_mates"], r["wedges"], r["butterflies"])
        for r in butterfly_counts(_turns(spark, rows), side="conv").collect()
    }
    assert gotc == {"c1": (1, 2, 1), "c2": (1, 2, 1)}


def test_bruteforce_parity_and_global_side_equality(spark):
    rng = random.Random(42)
    rows = [
        (f"c{rng.randrange(8)}", f"p{rng.randrange(10)}") for _ in range(120)
    ]
    t = _turns(spark, rows)
    for side, col in [("participant", "participant"), ("conv", "conv_id")]:
        want = _brute(rows, side)
        got = {
            r[col]: (r["n_mates"], r["wedges"], r["butterflies"])
            for r in butterfly_counts(t, side=side).collect()
        }
        assert got == want
    # global butterfly count is side-invariant: B = sum(b(v))/2 both ways
    tot = {
        side: butterfly_counts(t, side=side)
        .agg(F.sum("butterflies").alias("b"))
        .collect()[0]["b"]
        for side in ("participant", "conv")
    }
    assert tot["participant"] == tot["conv"] and tot["participant"] > 0


def test_max_group_size_drops_mega_groups(spark):
    # c_big has 5 members; capping at 4 removes every pair through it
    rows = [("c_big", f"p{i}") for i in range(5)] + [
        ("c1", "p0"), ("c1", "p1"), ("c2", "p0"), ("c2", "p1")
    ]
    capped = butterfly_counts(_turns(spark, rows), max_group_size=4)
    want = _brute([(c, p) for c, p in rows if c != "c_big"], "participant")
    got = {
        r["participant"]: (r["n_mates"], r["wedges"], r["butterflies"])
        for r in capped.collect()
    }
    assert got == want


def test_wedge_budget(spark):
    rows = [("c1", "p1"), ("c1", "p2"), ("c1", "p3"), ("c2", "p1")]
    got = {r["side"]: r["wedge_pairs"] for r in
           wedge_budget(_turns(spark, rows)).collect()}
    # through conversations: C(3,2)+C(1,2)=3 ; through participants:
    # p1 in 2 convs -> C(2,2)=1
    assert got == {"participant": 3, "conv": 1}
