"""bipartite_check (components.py) vs brute-force 2-coloring."""

from __future__ import annotations

from collections import defaultdict, deque

from crgp_spark.operators.components import bipartite_check


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


def _ref_bipartite(pairs):
    nb = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nb[a].add(b)
            nb[b].add(a)
    color = {}
    out = {}
    for start in sorted(nb):
        if start in color:
            continue
        comp = [start]
        color[start] = 0
        ok = True
        q = deque([start])
        while q:
            v = q.popleft()
            for w in nb[v]:
                if w not in color:
                    color[w] = color[v] ^ 1
                    comp.append(w)
                    q.append(w)
                elif color[w] == color[v]:
                    ok = False
        out[min(comp)] = (len(comp), ok)
    return out


def _run(spark, pairs):
    res = bipartite_check(spark, _edges(spark, pairs))
    return {
        r.component: (r.n_vertices, r.odd_edges, r.bipartite)
        for r in res.collect()
    }


def test_even_and_odd_cycles(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]  # C4 bipartite
    pairs += [(10, 11), (11, 12), (12, 10)]  # C3 odd
    got = _run(spark, pairs)
    assert got[0][2] is True and got[0][0] == 4
    assert got[10][2] is False and got[10][1] > 0


def test_star_and_path(spark):
    pairs = [(0, i) for i in range(1, 5)] + [(20, 21), (21, 22)]
    got = _run(spark, pairs)
    assert all(v[2] for v in got.values())


def test_brute_force(spark):
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 13) % 21, (i * 8 + 3) % 21) for i in range(35)
            )
            if a != b
        }
    )
    got = _run(spark, pairs)
    ref = _ref_bipartite(pairs)
    assert set(got) == set(ref)
    for c, (nv, ok) in ref.items():
        assert got[c][0] == nv
        assert got[c][2] is ok
