"""dominating_set (domset.py) against an exact Python mirror of the
parallel (span, -id) local-max rule."""

from __future__ import annotations

from collections import defaultdict

from crgp_spark.operators.domset import dominating_set


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


def _ref(pairs, rounds=4):
    nb = defaultdict(set)
    verts = set()
    for a, b in pairs:
        if a != b:
            nb[a].add(b)
            nb[b].add(a)
            verts |= {a, b}
    U = set(verts)
    dom, cov = {}, {}
    for r in range(1, rounds + 1):
        if not U:
            break
        sp = {
            v: (1 if v in U else 0) + len(nb[v] & U) for v in verts
        }
        winners = {
            v
            for v in verts
            if sp[v] >= 1
            and all((sp[v], -v) > (sp[u], -u) for u in nb[v])
        }
        newly = set()
        for w in winners:
            newly |= (nb[w] | {w}) & U
        for w in winners:
            dom[w] = r
        for v in newly:
            cov.setdefault(v, r)
        U -= newly
    out = {}
    for v in verts:
        if v in dom:
            out[v] = ("dom", dom[v])
        elif v in cov:
            out[v] = ("covered", cov[v])
        else:
            out[v] = ("open", 0)
    return out


def _run(spark, pairs, rounds=4):
    res = dominating_set(spark, _edges(spark, pairs), rounds=rounds)
    return {r.vid: (r.status, r.rnd) for r in res.collect()}


def test_star(spark):
    pairs = [(0, i) for i in range(1, 6)]
    got = _run(spark, pairs)
    assert got[0] == ("dom", 1)
    assert all(got[i] == ("covered", 1) for i in range(1, 6))


def test_path(spark):
    pairs = [(i, i + 1) for i in range(6)]
    got = _run(spark, pairs)
    assert got == _ref(pairs)
    # the dominating set actually dominates: every vertex dom or covered
    assert all(s in ("dom", "covered") for s, _ in got.values())


def test_two_triangles_bridge(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = _run(spark, pairs)
    assert got == _ref(pairs)


def test_brute_force_random(spark):
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 17) % 23, (i * 5 + 7) % 23) for i in range(45)
            )
            if a != b
        }
    )
    got = _run(spark, pairs)
    assert got == _ref(pairs)
    # domination check for everything not 'open'
    nbs = defaultdict(set)
    for a, b in pairs:
        nbs[a].add(b)
        nbs[b].add(a)
    doms = {v for v, (s, _) in got.items() if s == "dom"}
    for v, (s, _) in got.items():
        if s != "open":
            assert v in doms or nbs[v] & doms
