"""Cascade-local graph algorithms: connected components, label
propagation and triangle counting over conversation-partitioned blocks
(see operators/cascade.py for the layout and why it is exact:
influence edges never cross conversations, so per-block computation is
per-subgraph computation).

Each algorithm runs ONE ``applyInPandas`` pass with an in-block kernel —
no supersteps, no shuffles beyond the single group-by-part exchange of
the edge scan. The kernels are fully vectorized numpy (VERDICT r1: the
previous dict/set-loop kernels were interpreter-speed per edge — a
scale-killer once a 32-partition pack of a 10^9-edge table puts ~3·10^7
edges in one task):

- components: pointer-jumping min-label propagation (np.minimum.at +
  path compression), exact everywhere — per-block labels of SPLIT
  conversations are reconciled with a driver-side union-find over the
  (tiny, size-capped) set of block-boundary vertices;
- labelprop: per-iteration (vertex,label) histogram via np.unique on
  packed codes, argmax with min-label tie-break via lexsort — identical
  semantics to the generic superstep implementation;
- triangles: rank-oriented adjacency + vectorized wedge enumeration
  (inverse-triangular-index trick) + sorted-code membership test
  (np.searchsorted) — the compact-forward algorithm, O(m^1.5) work
  bound, zero Python-level loops.

Split conversations (hub-salting): labelprop/triangles run a HYBRID
(VERDICT r2 ask #4): the in-block kernel pass runs over the full pack —
its outputs are exact for every UNSPLIT conversation even in blocks
that also hold split-conversation fragments, because conversations are
vertex-disjoint subgraphs and the kernels are per-subgraph — then the
vertices of split conversations are discarded (anti-join) and
recomputed over the split conversations' edges only, and the two
results union. The residue itself prefers the kernel path: a split
conversation that still fits one vectorized task
(``RESIDUE_KERNEL_MAX_EDGES``) runs the same kernel grouped directly
by conversation over the raw residue edges (no pack, one small
shuffle); only conversations beyond kernel reach fall back to the
generic superstep/DataFrame implementation. A
single split hub conversation therefore no longer forfeits the ~10x
cascade advantage for the whole job. All three algorithms match their generic
counterparts exactly (tests/test_cascade_algos.py, incl. forced-split
inputs).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.cascade import pack_cascade, placement_path

#: boundary-reconciliation driver collect cap (vertices). A pathological
#: all-split input would make the boundary set O(V); above this we fall
#: back to the generic distributed path instead of OOMing the driver.
MAX_BOUNDARY_COLLECT = 2_000_000

#: Largest conversation the split-residue path will hand to a single
#: vectorized in-block kernel task (repacked UNSPLIT). The kernels are
#: proven at ~10M edges/block in seconds (BASELINE.md kernel table);
#: 20M keeps one task's numpy arrays well under an executor's memory.
#: Conversations beyond this use the generic distributed path — the
#: only case where per-superstep fixed cost is worth paying.
RESIDUE_KERNEL_MAX_EDGES = 20_000_000


def _ensure_pack(
    edges: DataFrame, cfg: EngineConfig, path: str, reuse_pack: bool = False
) -> dict:
    """Pack ``edges`` at ``path``. REPACKS by default (matching
    pagerank_cascade): a stale pack from a previous call with a
    different edge table must never be silently reused (ADVICE r1).
    ``reuse_pack=True`` opts into reuse for callers that packed ahead
    of time (bench harnesses timing the phases separately)."""
    stats_file = os.path.join(path, "_pack_stats.json")
    if reuse_pack and os.path.exists(stats_file):
        with open(stats_file) as f:
            stats = json.load(f)
        from crgp_spark.operators.pack import PACK_FORMAT_VERSION

        # refuse to reuse an old-layout pack (see cascade.pagerank_cascade)
        if stats.get("format_version") == PACK_FORMAT_VERSION:
            return stats
    return pack_cascade(edges, cfg, path)


def _block_edges(spark: SparkSession, path: str) -> DataFrame:
    """(part, src, dst) resident edge rows, exploded from the blocks."""
    blocks = spark.read.parquet(path)
    return blocks.select(
        "part",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("src_ids") - 1),
                lambda i: F.struct(
                    F.col("src_ids")[i].alias("s"),
                    F.slice(
                        F.col("dst"),
                        F.col("indptr")[i].cast("int") + 1,
                        (F.col("indptr")[i + 1] - F.col("indptr")[i]).cast("int"),
                    ).alias("adj"),
                ),
            )
        ).alias("z"),
    ).select("part", F.col("z.s").alias("src"), F.explode("z.adj").alias("dst"))


def _split_residue(
    edges: DataFrame, cfg: EngineConfig
) -> tuple[DataFrame, DataFrame, int]:
    """(split_edges, split_vids, max_conv_edges) of the conversations
    the pack salted into sub-blocks (edge count > hub_degree_threshold
    — the exact pack_cascade condition). The conv-id set is tiny by
    construction (hub conversations only) so its semi-join side
    broadcasts; the vid set of a giant conversation can be large, so
    the caller's anti-join against it stays a distributed join.
    ``max_conv_edges`` picks the residue strategy (kernel vs generic)."""
    sizes = edges.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_e"))
    split = sizes.filter(
        F.col("n_e") > cfg.hub_degree_threshold
    ).select("conv_id", "n_e")
    split_edges = edges.join(
        F.broadcast(split.select("conv_id")), "conv_id", "left_semi"
    )
    split_vids = (
        split_edges.select(F.col("src").alias("vid"))
        .unionByName(split_edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    max_conv = split.agg(F.max("n_e")).first()[0] or 0
    return split_edges, split_vids, int(max_conv)


# -- shared kernel helpers ---------------------------------------------------


def _compact(src: np.ndarray, dst: np.ndarray):
    """Map vids to compact indices. Returns (nodes sorted asc, si, di)."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    return nodes, inv[: len(src)], inv[len(src) :]


def _undirected(si: np.ndarray, di: np.ndarray, n: int):
    """Distinct undirected pairs (a < b) as index arrays; drops loops
    and merges (a,b)/(b,a) duplicates (the generic implementations use
    an undirected neighbor SET — a bidirectional edge must not count
    its neighbor twice)."""
    a = np.minimum(si, di)
    b = np.maximum(si, di)
    keep = a != b
    codes = np.unique(a[keep].astype(np.int64) * n + b[keep])
    return codes // n, codes % n


def _min_label_components(si: np.ndarray, di: np.ndarray, n: int) -> np.ndarray:
    """Vectorized connected components: min-label propagation with
    pointer jumping. Returns label index array (fixed point of lab[lab]);
    the component id is the minimum member INDEX, which (nodes sorted
    ascending) is also the minimum member vid."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, di, lab[si])
        np.minimum.at(lab, si, lab[di])
        lab = np.minimum(lab, lab[lab])  # pointer halving
        if np.array_equal(lab, old):
            break
    while not np.array_equal(lab, lab[lab]):
        lab = lab[lab]
    return lab


def _components_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    nodes, si, di = _compact(src, dst)
    lab = _min_label_components(si, di, len(nodes))
    return pd.DataFrame({"vid": nodes, "component": nodes[lab]})


def _labelprop_kernel_factory(max_iter: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        nodes, si, di = _compact(src, dst)
        n = len(nodes)
        ua, ub = _undirected(si, di, n)
        ui = np.concatenate([ua, ub])  # vertex endpoint
        vi = np.concatenate([ub, ua])  # its neighbor
        lab = np.arange(n, dtype=np.int64)
        for _ in range(max_iter):
            # histogram over (vertex, neighbor-label) pairs
            code = ui * n + lab[vi]
            uniq, cnt = np.unique(code, return_counts=True)
            v = uniq // n
            l = uniq % n
            # per vertex: max count, tie-break min label (labels are
            # vertex indices; nodes sorted asc => index order == vid order)
            order = np.lexsort((l, -cnt, v))
            vo, lo = v[order], l[order]
            first = np.unique(vo, return_index=True)[1]
            new = lab.copy()
            new[vo[first]] = lo[first]
            if np.array_equal(new, lab):
                break
            lab = new
        # vertex universe = endpoints of non-loop edges (matches the
        # generic implementation; self-loop-only vertices are excluded)
        touched = np.zeros(n, dtype=bool)
        touched[ua] = True
        touched[ub] = True
        return pd.DataFrame(
            {"vid": nodes[touched], "label": nodes[lab][touched]}
        )

    return kernel


def _pair_indices(d: np.ndarray):
    """Vectorized enumeration of all within-group index pairs (i<j) for
    groups of sizes ``d``. Returns (grp, i, j) arrays — the
    inverse-triangular-index trick, no Python loop."""
    p = d * (d - 1) // 2
    total = int(p.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    grp = np.repeat(np.arange(len(d), dtype=np.int64), p)
    k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(p) - p, p)
    s = d[grp]
    # i = floor(((2s-1) - sqrt((2s-1)^2 - 8k)) / 2), then float-safety fixup
    twos1 = 2 * s - 1
    i = ((twos1 - np.sqrt(twos1.astype(np.float64) ** 2 - 8 * k)) // 2).astype(
        np.int64
    )

    def f(ii):  # pairs with first-index < ii
        return ii * (2 * s - ii - 1) // 2

    i = np.where(f(i + 1) <= k, i + 1, i)
    i = np.where(f(i) > k, i - 1, i)
    j = k - f(i) + i + 1
    return grp, i, j


def _triangles_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    nodes, si, di = _compact(src, dst)
    n = len(nodes)
    per = np.zeros(n, dtype=np.int64)
    ua, ub = _undirected(si, di, n)
    if len(ua):
        # orient low-(degree,id) -> high-(degree,id): out-degree O(sqrt m)
        deg = np.bincount(ua, minlength=n) + np.bincount(ub, minlength=n)
        rank = np.lexsort((np.arange(n), deg))  # rank order
        rpos = np.empty(n, dtype=np.int64)
        rpos[rank] = np.arange(n)
        ra, rb = rpos[ua], rpos[ub]
        lo = np.where(ra < rb, ra, rb)
        hi = np.where(ra < rb, rb, ra)
        # CSR over lo with adjacency sorted by hi-rank
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        srcs, counts = np.unique(lo, return_counts=True)
        dd = np.zeros(n, dtype=np.int64)
        dd[srcs] = counts
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dd, out=indptr[1:])
        # wedges (b, c) with rank(b) < rank(c), apex u
        grp, i, j = _pair_indices(dd)
        if len(grp):
            b = hi[indptr[grp] + i]
            c = hi[indptr[grp] + j]
            # membership of oriented edge (b, c) in sorted codes
            codes = lo * n + hi
            w = b * n + c
            pos = np.searchsorted(codes, w)
            ok = (pos < len(codes)) & (codes[np.minimum(pos, len(codes) - 1)] == w)
            apex, bb, cc = grp[ok], b[ok], c[ok]
            hits = np.concatenate([apex, bb, cc])
            per_rank = np.bincount(hits, minlength=n)
            per = np.zeros(n, dtype=np.int64)
            per[rank] = per_rank  # back from rank space to index space
    touched = np.zeros(n, dtype=bool)
    touched[ua] = True
    touched[ub] = True
    return pd.DataFrame({"vid": nodes[touched], "triangles": per[touched]})


_BFS_INF = np.int64(1) << 60


def _bfs_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized multi-source BFS over one conversation's edges.

    Input rows are the conversation's ``(src, dst)`` edges plus
    source-marker rows flagged ``is_src`` (dst ignored; a boolean flag
    rather than a NULL dst keeps the vid columns int64 end-to-end — a
    nullable long would round-trip through float64 in Arrow/pandas and
    corrupt vids ≥ 2^53).  Distance relaxation is the Bellman-Ford
    recurrence ``d[v] = min(d[v], d[u]+1)`` run to fixpoint with
    ``np.minimum.at`` — O(E) per round, rounds = eccentricity of the
    source set (conversation DAGs: a handful).  Returns ``(vid, dist)``
    for reached vertices only, matching ``bfs_hops``."""
    is_src = pdf["is_src"].to_numpy()
    src = pdf["src"].to_numpy().astype(np.int64)
    e_src = src[~is_src]
    e_dst = pdf["dst"].to_numpy().astype(np.int64)[~is_src]
    s_v = src[is_src]
    nodes, inv = np.unique(
        np.concatenate([e_src, e_dst, s_v]), return_inverse=True
    )
    ne = len(e_src)
    si, di, srci = inv[:ne], inv[ne : 2 * ne], inv[2 * ne :]
    dist = np.full(len(nodes), _BFS_INF, dtype=np.int64)
    dist[srci] = 0
    while True:
        nd = dist.copy()
        if ne:
            np.minimum.at(nd, di, dist[si] + 1)
        if np.array_equal(nd, dist):
            break
        dist = nd
    reached = dist < _BFS_INF
    return pd.DataFrame(
        {"vid": nodes[reached], "dist": dist[reached].astype(np.int32)}
    )


def cascade_bfs(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Multi-source BFS over the conversation-partitioned layout: ONE
    ``applyInPandas`` pass grouped by conversation — no supersteps, no
    per-round shuffles — exact because influence edges never cross
    conversations, so hop distances are conversation-local.

    ``edges`` = (src, dst, conv_id); ``sources`` = (conv_id, vid).
    Source markers ride the same shuffle as the edges (``is_src`` flag
    rows), so the kernel needs no side channel.  Conversations beyond
    ``RESIDUE_KERNEL_MAX_EDGES`` fall back to the generic superstep
    ``bfs_hops`` over their edges only and union in (the split-residue
    hybrid pattern)."""
    cfg = cfg or EngineConfig()
    rows = edges.select(
        "conv_id", F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.lit(False).alias("is_src"),
    )
    srows = sources.select(
        "conv_id",
        F.col("vid").cast("long").alias("src"),
        F.col("vid").cast("long").alias("dst"),
        F.lit(True).alias("is_src"),
    )
    sizes = edges.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_e"))
    big = sizes.filter(F.col("n_e") > RESIDUE_KERNEL_MAX_EDGES).select("conv_id")
    if big.isEmpty():
        return rows.unionByName(srows).groupBy("conv_id").applyInPandas(
            _bfs_kernel, "vid long, dist int"
        )
    small = rows.unionByName(srows).join(
        F.broadcast(big), "conv_id", "left_anti"
    )
    local = small.groupBy("conv_id").applyInPandas(
        _bfs_kernel, "vid long, dist int"
    )
    from crgp_spark.operators.bfs import bfs_hops

    big_edges = edges.join(F.broadcast(big), "conv_id", "left_semi")
    big_sources = sources.join(F.broadcast(big), "conv_id", "left_semi")
    residue = bfs_hops(
        spark, big_edges.select("src", "dst"),
        big_sources.select("vid"), cfg,
    )
    return local.unionByName(residue.select("vid", "dist"))


# -- connected components ---------------------------------------------------


def cascade_components(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    algo_name: str = "cascade_components",
    pack_path: str | None = None,
    reuse_pack: bool = False,
) -> DataFrame:
    """Exact (vid, component) with component = min vid of the component;
    one kernel pass + boundary reconciliation for split conversations."""
    cfg = cfg or EngineConfig()
    path = pack_path or os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    _ensure_pack(edges, cfg, path, reuse_pack=reuse_pack)

    local = (
        _block_edges(spark, path)
        .groupBy("part")
        .applyInPandas(_components_kernel, "vid long, component long")
    )

    placement = spark.read.parquet(placement_path(path))
    if placement.isEmpty():
        return local

    # boundary vertices live in several blocks; merge their local labels
    # with a driver-side union-find, then relabel via a broadcast map.
    # The boundary is split-conversation sources only — tiny by design —
    # but cap the collect: a pathological all-split input falls back to
    # the fully distributed generic path instead of OOMing the driver.
    local = local.persist()
    boundary_df = local.join(
        placement.select("vid").distinct(), "vid", "left_semi"
    ).persist()
    if boundary_df.count() > MAX_BOUNDARY_COLLECT:
        local.unpersist()
        boundary_df.unpersist()
        from crgp_spark.operators.components import connected_components

        return connected_components(spark, edges.select("src", "dst"), cfg)
    boundary = boundary_df.collect()
    boundary_df.unpersist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in boundary:
        a, b = find(int(r["vid"])), find(int(r["component"]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    remap = [
        (c, find(c))
        for c in {int(r["component"]) for r in boundary}
        if find(c) != c
    ]
    if not remap:
        out = local.dropDuplicates(["vid"])
        return out
    remap_df = F.broadcast(
        spark.createDataFrame(remap, "component long, final long")
    )
    out = (
        local.join(remap_df, "component", "left")
        .select(
            "vid", F.coalesce("final", "component").alias("component")
        )
        .groupBy("vid")
        .agg(F.min("component").alias("component"))
    )
    return out


# -- label propagation ------------------------------------------------------


def cascade_labelprop(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    fixed_iterations: int | None = None,
    algo_name: str = "cascade_labelprop",
    pack_path: str | None = None,
    reuse_pack: bool = False,
) -> DataFrame:
    """Synchronous min-tie-break label propagation. In-block kernels
    everywhere; split conversations (hub-salted across sub-blocks) are
    recomputed by the generic superstep path over their edges only and
    unioned in (split-residue hybrid — see module docstring). Returns
    (vid, label)."""
    cfg = cfg or EngineConfig()
    path = pack_path or os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    _ensure_pack(edges, cfg, path, reuse_pack=reuse_pack)
    placement = spark.read.parquet(placement_path(path))

    max_iter = fixed_iterations or cfg.max_iterations
    local = (
        _block_edges(spark, path)
        .groupBy("part")
        .applyInPandas(
            _labelprop_kernel_factory(max_iter), "vid long, label long"
        )
    )
    if placement.isEmpty():
        # no cut edges: every conversation (even size-split ones whose
        # sub-blocks happen to be edge-closed) is exact in-block
        return local

    split_edges, split_vids, max_conv = _split_residue(edges, cfg)
    if max_conv <= RESIDUE_KERNEL_MAX_EDGES:
        # every split conversation still fits one kernel task: run the
        # same in-block kernel grouped BY CONVERSATION over the raw
        # residue edges — no pack, no superstep fixed costs, one
        # ~|residue|-row shuffle (the kernels only read src/dst)
        residue = split_edges.groupBy("conv_id").applyInPandas(
            _labelprop_kernel_factory(max_iter), "vid long, label long"
        )
    else:
        from crgp_spark.operators.labelprop import label_propagation

        residue = label_propagation(
            spark, split_edges.select("src", "dst"), cfg,
            fixed_iterations=fixed_iterations, algo_name=algo_name + "_res",
        ).state
    return local.join(split_vids, "vid", "left_anti").unionByName(
        residue.select("vid", "label")
    )


# -- triangle counting ------------------------------------------------------


def cascade_triangles(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    algo_name: str = "cascade_triangles",
    pack_path: str | None = None,
    reuse_pack: bool = False,
) -> tuple[int, DataFrame]:
    """Exact (total, per-vertex) triangle counts. In-block kernels
    everywhere; split conversations are recomputed by the generic
    degree-oriented join plan over their edges only and unioned in
    (split-residue hybrid — see module docstring)."""
    cfg = cfg or EngineConfig()
    path = pack_path or os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    _ensure_pack(edges, cfg, path, reuse_pack=reuse_pack)
    placement = spark.read.parquet(placement_path(path))

    per_vertex = (
        _block_edges(spark, path)
        .groupBy("part")
        .applyInPandas(_triangles_kernel, "vid long, triangles long")
    )
    if not placement.isEmpty():
        split_edges, split_vids, max_conv = _split_residue(edges, cfg)
        if max_conv <= RESIDUE_KERNEL_MAX_EDGES:
            # same kernel, grouped by conversation — no pack needed
            res_pv = split_edges.groupBy("conv_id").applyInPandas(
                _triangles_kernel, "vid long, triangles long"
            )
        else:
            from crgp_spark.operators.triangles import triangles

            _res_total, res_pv = triangles(
                spark, split_edges.select("src", "dst"), cfg
            )
        per_vertex = per_vertex.join(
            split_vids, "vid", "left_anti"
        ).unionByName(res_pv.select("vid", "triangles"))
    per_vertex = per_vertex.persist()
    total = int(
        (per_vertex.agg(F.sum("triangles")).first()[0] or 0) // 3
    )
    return total, per_vertex


def _bridges_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact bridges of one conversation's undirected edges — the
    `operators/bridges.py` pipeline run vectorized inside one task:
    min-label components, BFS distances, MIN-parent forest, then a
    vectorized LCA walk that bumps a crossing counter on every tree
    edge under each non-tree edge's fundamental cycle (O(E · depth)
    work, O(V + E) memory — no ancestor matrix).  A tree edge above
    child ``c`` is a bridge iff ``crossing[c] == 0``.  Returns the
    canonical ``(u, v)`` bridge rows, matching the generic operator
    bit for bit (same forest: component-minimum roots, minimum
    parents)."""
    s = pdf["src"].to_numpy().astype(np.int64)
    d = pdf["dst"].to_numpy().astype(np.int64)
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    keep = lo != hi
    if not keep.any():
        return pd.DataFrame({"u": np.empty(0, np.int64),
                             "v": np.empty(0, np.int64)})
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    lo, hi = pairs[:, 0], pairs[:, 1]
    nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    m = len(lo)
    a, b = inv[:m], inv[m:]
    n = len(nodes)

    # min-label components (relaxation to fixpoint, O(diameter) rounds)
    lab = np.arange(n)
    while True:
        nl = lab.copy()
        np.minimum.at(nl, b, lab[a])
        np.minimum.at(nl, a, lab[b])
        if np.array_equal(nl, lab):
            break
        lab = nl

    # BFS distances from the component-minimum roots
    inf = np.int64(1) << 60
    dist = np.full(n, inf, dtype=np.int64)
    dist[lab == np.arange(n)] = 0
    while True:
        nd = dist.copy()
        np.minimum.at(nd, b, dist[a] + 1)
        np.minimum.at(nd, a, dist[b] + 1)
        if np.array_equal(nd, dist):
            break
        dist = nd

    # parent = MIN neighbor one hop closer (by vertex id, then index)
    pa = np.concatenate([a, b])
    pb = np.concatenate([b, a])
    ok = dist[pa] == dist[pb] - 1
    pnode = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(pnode, pb[ok], nodes[pa[ok]])
    has_par = dist > 0
    pidx = np.full(n, -1, dtype=np.int64)
    pidx[has_par] = np.searchsorted(nodes, pnode[has_par])

    # non-tree edges: neither endpoint is the other's parent
    tree_mask = (pidx[b] == a) | (pidx[a] == b)
    crossing = np.zeros(n, dtype=np.int64)
    cu, cv = a[~tree_mask].copy(), b[~tree_mask].copy()
    while True:
        diff = cu != cv
        if not diff.any():
            break
        lift_u = diff & (dist[cu] >= dist[cv])
        lift_v = diff & (dist[cv] > dist[cu])
        # equal-depth distinct nodes lift BOTH sides this round
        lift_v |= diff & (dist[cu] == dist[cv])
        np.add.at(crossing, cu[lift_u], 1)
        np.add.at(crossing, cv[lift_v], 1)
        cu[lift_u] = pidx[cu[lift_u]]
        cv[lift_v] = pidx[cv[lift_v]]

    child = np.where(has_par & (crossing == 0))[0]
    bu = np.minimum(nodes[child], nodes[pidx[child]])
    bv = np.maximum(nodes[child], nodes[pidx[child]])
    return pd.DataFrame({"u": bu, "v": bv})


def cascade_bridges(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Bridges over the conversation-partitioned layout: ONE
    ``applyInPandas`` pass grouped by conversation — exact because
    influence edges never cross conversations, so every fundamental
    cycle is conversation-local.  ``edges`` = (src, dst, conv_id).
    Conversations beyond ``RESIDUE_KERNEL_MAX_EDGES`` fall back to the
    generic `operators.bridges.bridges` over their edges only and
    union in (the split-residue hybrid pattern)."""
    from crgp_spark.operators.bridges import bridges as generic_bridges

    cfg = cfg or EngineConfig()
    rows = edges.select(
        "conv_id",
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    sizes = rows.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_e"))
    big = sizes.filter(F.col("n_e") > RESIDUE_KERNEL_MAX_EDGES).select(
        "conv_id"
    )
    if big.isEmpty():
        return rows.groupBy("conv_id").applyInPandas(
            _bridges_kernel, "u long, v long"
        )
    small = rows.join(F.broadcast(big), "conv_id", "left_anti")
    local = small.groupBy("conv_id").applyInPandas(
        _bridges_kernel, "u long, v long"
    )
    residue = rows.join(F.broadcast(big), "conv_id", "left_semi").select(
        "src", "dst"
    )
    return local.unionByName(generic_bridges(spark, residue, cfg))
