"""Slow exact oracles (pure numpy / pandas / stdlib) for the graph
algorithms — SURVEY.md §5 strategy (3)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank_oracle(
    edges: pd.DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    fixed_iterations: int | None = None,
) -> dict[int, float]:
    """Power iteration with dangling-mass redistribution, matching the
    engine's formula exactly: rank' = (1-a)/N + a*(in_contrib + dangling/N)."""
    vids = np.unique(np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()]))
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    src = np.array([idx[v] for v in edges["src"]])
    dst = np.array([idx[v] for v in edges["dst"]])
    outdeg = np.bincount(src, minlength=n)
    rank = np.full(n, 1.0 / n)
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    for _ in range(n_iter):
        dangling = rank[outdeg == 0].sum()
        contrib = rank[src] / outdeg[src]
        in_sum = np.bincount(dst, weights=contrib, minlength=n)
        new_rank = (1 - alpha) / n + alpha * (in_sum + dangling / n)
        delta = np.abs(new_rank - rank).max()
        rank = new_rank
        if fixed_iterations is None and delta < tol:
            break
    return {int(v): float(rank[idx[v]]) for v in vids}


def components_oracle(edges: pd.DataFrame) -> dict[int, int]:
    """Union-find; component id = min vertex id in the component.
    Treats edges as undirected."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in zip(edges["src"], edges["dst"]):
        union(int(s), int(d))
    return {v: find(v) for v in list(parent)}


def label_propagation_oracle(
    edges: pd.DataFrame, n_iter: int = 10
) -> dict[int, int]:
    """Synchronous LP, undirected; new label = most frequent neighbor
    label, ties broken by smallest label; vertices keep their label if
    they have no neighbors. Deterministic."""
    vids = sorted(
        set(int(v) for v in edges["src"]) | set(int(v) for v in edges["dst"])
    )
    nbrs: dict[int, list[int]] = {v: [] for v in vids}
    for s, d in zip(edges["src"], edges["dst"]):
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].append(d)
            nbrs[d].append(s)
    labels = {v: v for v in vids}
    for _ in range(n_iter):
        new = {}
        for v in vids:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                lu = labels[u]
                counts[lu] = counts.get(lu, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            labels = new
            break
        labels = new
    return labels


def triangles_oracle(edges: pd.DataFrame) -> tuple[int, dict[int, int]]:
    """Exact triangle count (global + per-vertex), undirected simple
    graph (self-loops and duplicate edges ignored)."""
    adj: dict[int, set[int]] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        s, d = int(s), int(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    per_vertex = {v: 0 for v in adj}
    total = 0
    for v in adj:
        for u in adj[v]:
            if u <= v:
                continue
            common = adj[v] & adj[u]
            for w in common:
                if w > u:
                    total += 1
                    per_vertex[v] += 1
                    per_vertex[u] += 1
                    per_vertex[w] += 1
    return total, per_vertex


def random_edges(
    n_vertices: int, n_edges: int, seed: int, power_law: bool = False
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    if power_law:
        # preferential-attachment-ish skew: src sampled from zipf
        raw = rng.zipf(1.8, size=n_edges * 2)
        src = (raw[raw <= n_vertices][:n_edges] - 1).astype(np.int64)
        if len(src) < n_edges:
            src = np.concatenate(
                [src, rng.integers(0, n_vertices, n_edges - len(src))]
            )
        dst = rng.integers(0, n_vertices, n_edges).astype(np.int64)
    else:
        src = rng.integers(0, n_vertices, n_edges).astype(np.int64)
        dst = rng.integers(0, n_vertices, n_edges).astype(np.int64)
    df = pd.DataFrame({"src": src * 7919 + 13, "dst": dst * 7919 + 13})
    return df[df["src"] != df["dst"]].drop_duplicates().reset_index(drop=True)


def scc_oracle(edges: pd.DataFrame) -> dict[int, int]:
    """Iterative Tarjan; label = min vertex id of the SCC. Vertex
    universe = edge endpoints (matches strongly_connected_components)."""
    from collections import defaultdict

    g: dict[int, list[int]] = defaultdict(list)
    verts: set[int] = set()
    for s, d in zip(edges["src"], edges["dst"]):
        s, d = int(s), int(d)
        verts.add(s)
        verts.add(d)
        if s != d:
            g[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    onstk: set[int] = set()
    stk: list[int] = []
    label: dict[int, int] = {}
    cnt = 0
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, i = work.pop()
            if i == 0:
                index[v] = low[v] = cnt
                cnt += 1
                stk.append(v)
                onstk.add(v)
            descended = False
            for j in range(i, len(g[v])):
                w = g[v][j]
                if w not in index:
                    work.append((v, j + 1))
                    work.append((w, 0))
                    descended = True
                    break
                if w in onstk:
                    low[v] = min(low[v], index[w])
            if descended:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return label
