"""Cascade-local graph algorithms: connected components, label
propagation and triangle counting over conversation-partitioned blocks
(see operators/cascade.py for the layout and why it is exact:
influence edges never cross conversations, so per-block computation is
per-subgraph computation).

Each algorithm runs ONE ``applyInPandas`` pass with an in-block kernel
(union-find / numpy LP / sorted-adjacency triangle count) — no
supersteps, no shuffles beyond the single group-by-part exchange of the
edge scan. Split conversations (hub-salting) are handled per algorithm:

- components: exact everywhere — per-block labels are reconciled with a
  driver-side union-find over the (tiny) set of block-boundary vertices
  and a broadcast relabel join;
- labelprop / triangles: neighborhoods may span sub-blocks of a split
  conversation, so these DELEGATE to the generic superstep/DataFrame
  implementations when the packing produced replicas (exactness first;
  hub conversations are the rare case by construction).

All three match their generic counterparts exactly (tests/test_cascade_algos.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.cascade import pack_cascade


def _ensure_pack(edges: DataFrame, cfg: EngineConfig, path: str) -> dict:
    import json

    stats_file = os.path.join(path, "_pack_stats.json")
    if os.path.exists(stats_file):
        with open(stats_file) as f:
            return json.load(f)
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


# -- connected components ---------------------------------------------------


def _uf_components(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src, dst):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in list(parent)}


def cascade_components(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    algo_name: str = "cascade_components",
    pack_path: str | None = None,
) -> DataFrame:
    """Exact (vid, component) with component = min vid of the component;
    one kernel pass + boundary reconciliation for split conversations."""
    cfg = cfg or EngineConfig()
    path = pack_path or os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    _ensure_pack(edges, cfg, path)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        comp = _uf_components(pdf["src"].to_numpy(), pdf["dst"].to_numpy())
        return pd.DataFrame(
            {
                "vid": np.fromiter(comp.keys(), dtype=np.int64, count=len(comp)),
                "component": np.fromiter(
                    comp.values(), dtype=np.int64, count=len(comp)
                ),
            }
        )

    local = (
        _block_edges(spark, path)
        .groupBy("part")
        .applyInPandas(kernel, "vid long, component long")
    )

    placement = spark.read.parquet(os.path.join(path, "_placement"))
    if placement.isEmpty():
        return local

    # boundary vertices live in several blocks; merge their local labels
    # with a driver-side union-find, then relabel via a broadcast map.
    local = local.persist()
    boundary = (
        local.join(placement.select("vid").distinct(), "vid", "left_semi")
        .collect()
    )
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
) -> DataFrame:
    """Synchronous min-tie-break label propagation, in-block (exact when
    the packing produced no split conversations; otherwise delegates to
    the generic superstep implementation). Returns (vid, label)."""
    cfg = cfg or EngineConfig()
    path = pack_path or os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    _ensure_pack(edges, cfg, path)
    placement = spark.read.parquet(os.path.join(path, "_placement"))
    if not placement.isEmpty():
        from crgp_spark.operators.labelprop import label_propagation

        return label_propagation(
            spark, edges.select("src", "dst"), cfg,
            fixed_iterations=fixed_iterations, algo_name=algo_name + "_gen",
        ).state

    max_iter = fixed_iterations or cfg.max_iterations

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        und = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
        nbrs: dict[int, list[int]] = {}
        for a, b in und:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
        labels = {v: v for v in nbrs}
        for _ in range(max_iter):
            new = {}
            changed = False
            for v, ns in nbrs.items():
                counts: dict[int, int] = {}
                for u in ns:
                    lu = labels[u]
                    counts[lu] = counts.get(lu, 0) + 1
                best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                new[v] = best
                changed |= best != labels[v]
            labels = new
            if not changed:
                break
        return pd.DataFrame(
            {
                "vid": np.fromiter(labels.keys(), dtype=np.int64, count=len(labels)),
                "label": np.fromiter(
                    labels.values(), dtype=np.int64, count=len(labels)
                ),
            }
        )

    return (
        _block_edges(spark, path)
        .groupBy("part")
        .applyInPandas(kernel, "vid long, label long")
    )


# -- triangle counting ------------------------------------------------------


def cascade_triangles(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    algo_name: str = "cascade_triangles",
    pack_path: str | None = None,
) -> tuple[int, DataFrame]:
    """Exact (total, per-vertex) triangle counts, in-block (delegates to
    the generic join plan when the packing split conversations)."""
    cfg = cfg or EngineConfig()
    path = pack_path or os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    _ensure_pack(edges, cfg, path)
    placement = spark.read.parquet(os.path.join(path, "_placement"))
    if not placement.isEmpty():
        from crgp_spark.operators.triangles import triangles

        return triangles(spark, edges.select("src", "dst"), cfg)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict[int, set[int]] = {}
        for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
            s, d = int(s), int(d)
            if s == d:
                continue
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        per = {v: 0 for v in adj}
        for v in adj:
            for u in adj[v]:
                if u <= v:
                    continue
                for w in adj[v] & adj[u]:
                    if w > u:
                        per[v] += 1
                        per[u] += 1
                        per[w] += 1
        return pd.DataFrame(
            {
                "vid": np.fromiter(per.keys(), dtype=np.int64, count=len(per)),
                "triangles": np.fromiter(
                    per.values(), dtype=np.int64, count=len(per)
                ),
            }
        )

    per_vertex = (
        _block_edges(spark, path)
        .groupBy("part")
        .applyInPandas(kernel, "vid long, triangles long")
        .persist()
    )
    total = int(
        (per_vertex.agg(F.sum("triangles")).first()[0] or 0) // 3
    )
    return total, per_vertex
