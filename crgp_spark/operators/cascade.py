"""Cascade-local PageRank: CSR blocks partitioned by conversation.

The influence-edge derivation guarantees a structural invariant the
generic salted-src layout (operators/pack.py) cannot exploit: **edges
never cross conversations** (every edge's src and dst are turns of one
``conv_id`` — derive.py). Hash-partitioning vertex ids scatters each
conversation across all partitions, so per-partition combining buys
nothing and every superstep ships ~|E| messages (measured: 9.67 M
messages for 9.87 M edges). Partitioning by conversation instead makes
the gather, the per-destination combine AND the state update all
partition-local:

- block = all edges of the conversations assigned to the partition,
  CSR by src, plus the partition's full vertex set and global
  out-degrees;
- state ``(part, vid, rank)`` lives hash-partitioned by ``part`` and
  never moves;
- the ONLY cross-partition data per superstep is the dangling-mass
  scalar (64 partial sums collected to the driver) — the analog of the
  reference's epoch barrier, shrunk to its information-theoretic
  minimum.

Hub skew (north rule R1): a conversation whose edge count exceeds
``hub_degree_threshold`` is split into up to ``max_salt`` salted
sub-blocks by ``hash(dst)`` — a destination's in-edges stay in one
sub-block, so per-dst sums remain complete; only the RANKS of sources
whose out-edges land in a foreign sub-block are replicated there each
superstep (a broadcast-joinable sliver proportional to split-conv
sources, not to |E|). With no split conversations the superstep runs
with ZERO exchanges.

Checkpoints/lineage/resume ride the same ``run_loop`` harness as the
generic path; results match ``pagerank_df`` (same formula, same
dangling redistribution) — measured max per-vertex difference 6.6e-20
over 4.77 M vertices at 9.87 M edges, rank mass exactly 1.0.

Assumption (holds for every derivation output by construction): vertex
ids are unique to their conversation — ``vid = xxhash64(conv_id,
turn_idx)`` / ``uid*100000+turn`` never reuses an id across
conversations. Arbitrary edge tables violating this must use the
generic layout (operators/pack.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import LoopResult, StepOutcome, run_loop

#: per-vertex rows out of the kernel; one side row per partition
#: (kind=1) carries (dangling_partial, contrib_total) in (c, r_old).
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("part", T.IntegerType(), False),
        T.StructField("kind", T.ByteType(), False),
        T.StructField("vid", T.LongType(), False),
        T.StructField("c", T.DoubleType(), False),
        T.StructField("r_old", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = "part int, vid long, rank double"


def placement_path(pack_path: str) -> str:
    """Replica-placement table location: a SIBLING of the blocks dir, so
    ``spark.read.parquet(pack_path)`` never co-lists it (the nested
    layout caused an 'All paths were ignored' warn per read)."""
    return pack_path.rstrip("/") + "_placement"


def pack_cascade(edges: DataFrame, cfg: EngineConfig, path: str) -> dict:
    """Pack a conversation-keyed edge table ``(src, dst, conv_id)`` into
    cascade-local CSR blocks at ``path``. Returns pack statistics."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", "conv_id")

    conv_sizes = e.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_e"))
    n_salt = F.when(
        F.col("n_e") <= cfg.hub_degree_threshold, F.lit(1)
    ).otherwise(
        F.least(
            F.lit(cfg.max_salt),
            F.ceil(F.col("n_e") / F.lit(cfg.hub_degree_threshold)).cast("int"),
        )
    )
    sized = e.join(conv_sizes.select("conv_id", n_salt.alias("n_salt")), "conv_id")
    P = cfg.graph_partitions
    ann = sized.select(
        "src",
        "dst",
        "conv_id",
        "n_salt",
        F.pmod(F.xxhash64("dst"), F.col("n_salt")).cast("int").alias("salt"),
    ).withColumn(
        "part", F.pmod(F.xxhash64("conv_id", "salt"), F.lit(P)).cast("int")
    )

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))

    # vertex home: the sub-block that owns the vertex's in-edges
    verts = (
        e.select(F.col("src").alias("vid"), "conv_id")
        .unionByName(e.select(F.col("dst").alias("vid"), "conv_id"))
        .distinct()
        .join(conv_sizes.select("conv_id", n_salt.alias("n_salt")), "conv_id")
        .select(
            "vid",
            "conv_id",
            F.pmod(F.xxhash64("vid"), F.col("n_salt")).cast("int").alias("salt"),
        )
        .withColumn(
            "part", F.pmod(F.xxhash64("conv_id", "salt"), F.lit(P)).cast("int")
        )
        .join(deg.withColumnRenamed("src", "vid"), "vid", "left")
        .select("part", "vid", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    )

    # block build: per part, vertex table + CSR of resident edges
    edges_part = ann.select("part", "src", "dst").join(
        deg, "src"
    ).select("part", "src", "dst", "out_deg")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0])
        is_v = pdf["kind"].to_numpy() == 1
        vv = pdf[is_v]
        ee = pdf[~is_v]
        vids = vv["a"].to_numpy()
        vdeg = vv["d"].to_numpy()
        vorder = np.argsort(vids, kind="stable")
        vids, vdeg = vids[vorder], vdeg[vorder]
        order = np.lexsort((ee["b"].to_numpy(), ee["a"].to_numpy()))
        src = ee["a"].to_numpy()[order]
        dst = ee["b"].to_numpy()[order]
        edeg = ee["d"].to_numpy()[order]
        src_ids, first_idx, counts = np.unique(
            src, return_index=True, return_counts=True
        )
        indptr = np.zeros(len(src_ids) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return pd.DataFrame(
            {
                "part": [part],
                "n_v": [len(vids)],
                "n_edges": [len(dst)],
                "vids": [vids],
                "vdeg": [vdeg.astype(np.int64)],
                "src_ids": [src_ids],
                # global out-degree of each block source (edge rows carry
                # it), valid for resident AND foreign (replica) sources
                "src_deg": [edeg[first_idx].astype(np.int64)],
                "indptr": [indptr],
                "dst": [dst],
            }
        )

    unioned = (
        verts.select(
            "part", F.col("vid").alias("a"), F.lit(0).cast("long").alias("b"),
            F.lit(1).alias("kind"), F.col("out_deg").cast("long").alias("d"),
        )
        .unionByName(
            edges_part.select(
                "part", F.col("src").alias("a"), F.col("dst").alias("b"),
                F.lit(0).alias("kind"), F.col("out_deg").cast("long").alias("d"),
            )
        )
    )
    blocks = unioned.groupBy("part").applyInPandas(
        build,
        schema="part int, n_v long, n_edges long, vids array<long>, "
        "vdeg array<long>, src_ids array<long>, src_deg array<long>, "
        "indptr array<long>, dst array<long>",
    )
    blocks.write.mode("overwrite").partitionBy("part").parquet(path)

    # replica placement: sources whose out-edges sit in a foreign block
    homes = verts.select(F.col("vid").alias("src"), F.col("part").alias("home"))
    placement = (
        ann.select("src", "part")
        .distinct()
        .join(homes, "src")
        .filter(F.col("part") != F.col("home"))
        .select(F.col("src").alias("vid"), "part")
    )
    placement.write.mode("overwrite").parquet(placement_path(path))

    r = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("n_edges").alias("n_edges"),
        F.max("n_edges").alias("max_edges"),
        F.avg("n_edges").alias("mean_edges"),
        F.sum("n_v").alias("n_verts"),
    ).first()
    n_replicas = spark.read.parquet(placement_path(path)).count()
    import uuid

    from crgp_spark.operators.pack import PACK_FORMAT_VERSION

    stats = {
        # cache-invalidation fingerprint, see pack.py::load_block
        "pack_id": uuid.uuid4().hex,
        "format_version": PACK_FORMAT_VERSION,
        "n_parts": int(r["n_parts"]),
        "n_edges": int(r["n_edges"]),
        "max_edges": int(r["max_edges"]),
        "mean_edges": float(r["mean_edges"]),
        "skew_ratio": float(r["max_edges"]) / max(float(r["mean_edges"]), 1.0),
        "n_verts": int(r["n_verts"]),
        "n_replicas": n_replicas,
        "graph_partitions": P,
    }
    with open(os.path.join(path, "_pack_stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def _load_cascade_block(path: str, part: int, pack_id: str | None = None):
    from crgp_spark.operators.pack import _BLOCK_CACHE, _cache_put

    key = (path, part, "cascade", pack_id)
    blk = _BLOCK_CACHE.get(key)
    if blk is None:
        import pyarrow.dataset as ds

        tbl = ds.dataset(
            os.path.join(path, f"part={part}"), format="parquet"
        ).to_table()
        blk = {
            name: tbl[name][0].values.to_numpy(zero_copy_only=False)
            for name in ("vids", "vdeg", "src_ids", "src_deg", "indptr", "dst")
        }
        _cache_put(key, blk)
    return blk


def _make_kernel(pack_path: str, pack_id: str | None = None):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0])
        blk = _load_cascade_block(pack_path, part, pack_id)
        vids, vdeg = blk["vids"], blk["vdeg"]
        src_ids, indptr, dst = blk["src_ids"], blk["indptr"], blk["dst"]

        rows_v = pdf["vid"].to_numpy()
        rows_r = pdf["rank"].to_numpy()
        order = np.argsort(rows_v, kind="stable")
        rows_v, rows_r = rows_v[order], rows_r[order]

        # resident ranks aligned to the block's sorted vertex table
        pos = np.searchsorted(rows_v, vids)
        rank = rows_r[np.minimum(pos, len(rows_v) - 1)]
        rank[rows_v[np.minimum(pos, len(rows_v) - 1)] != vids] = 0.0

        # gather: per-source weight; src_deg stored at pack time covers
        # resident AND replica sources
        spos = np.searchsorted(rows_v, src_ids)
        srank = rows_r[np.minimum(spos, len(rows_v) - 1)]
        svalid = rows_v[np.minimum(spos, len(rows_v) - 1)] == src_ids
        w = np.where(svalid, srank, 0.0) / np.maximum(blk["src_deg"], 1)

        contrib = np.repeat(w, np.diff(indptr))
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=contrib, minlength=len(uniq))

        # scatter back onto the vertex table (complete per dst)
        c = np.zeros(len(vids), dtype=np.float64)
        cpos = np.searchsorted(vids, uniq)
        c[cpos] = sums

        dang = float(rank[vdeg == 0].sum())
        out = pd.DataFrame(
            {
                "part": np.full(len(vids) + 1, part, dtype=np.int32),
                "kind": np.concatenate(
                    [np.zeros(len(vids), dtype=np.int8), [1]]
                ),
                "vid": np.concatenate([vids, [-1]]),
                "c": np.concatenate([c, [dang]]),
                "r_old": np.concatenate([rank, [float(sums.sum())]]),
            }
        )
        return out

    return kernel


def pagerank_cascade(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    resume: bool = False,
    algo_name: str = "pagerank_cascade",
    reuse_pack: bool = False,
) -> LoopResult:
    """Cascade-local CSR PageRank over a conversation-keyed edge table
    ``(src, dst, conv_id)``. Same formula/semantics as ``pagerank`` /
    ``pagerank_df``; state ``(vid, rank)``."""
    cfg = cfg or EngineConfig()
    pack_path = os.path.join(cfg.checkpoint_dir, algo_name, "graph")
    stats_file = os.path.join(pack_path, "_pack_stats.json")
    pstats = None
    if (resume or reuse_pack) and os.path.exists(stats_file):
        with open(stats_file) as f:
            pstats = json.load(f)
        from crgp_spark.operators.pack import PACK_FORMAT_VERSION

        # A pack written by an older layout (absent version = v1, nested
        # _placement dir) must not be reused — the sibling placement path
        # was never written and replicas would be silently lost.
        if pstats.get("format_version") != PACK_FORMAT_VERSION:
            pstats = None
    if pstats is None:
        pstats = pack_cascade(edges, cfg, pack_path)

    n = pstats["n_verts"]
    mean_edges = max(pstats["mean_edges"], 1.0)
    blocks_meta = {
        int(r["part"]): int(r["n_edges"])
        for r in spark.read.parquet(pack_path).select("part", "n_edges").collect()
    }
    placement = spark.read.parquet(placement_path(pack_path)).persist()
    has_replicas = placement.count() > 0

    verts_home = (
        spark.read.parquet(pack_path)
        .select("part", F.explode("vids").alias("vid"))
    )
    kernel = _make_kernel(pack_path, pstats.get("pack_id"))
    alpha, tol = cfg.damping, cfg.tol
    if cfg.tol_mode == "scaled":
        tol = tol / n

    def init_state() -> DataFrame:
        return (
            verts_home.select("part", "vid", F.lit(1.0 / n).alias("rank"))
            .repartition(cfg.graph_partitions, "part")
            .localCheckpoint(eager=True)
        )

    def step(state: DataFrame, it: int) -> StepOutcome:
        msgs_in = state
        if has_replicas:
            # no explicit broadcast hint: placement is tiny by design
            # (split-conv sources only) so AQE broadcasts it, but a
            # pathological all-split input must not OOM the driver
            reps = (
                placement.withColumnRenamed("part", "to_part")
                .join(state.select("vid", "rank"), "vid")
                .select(F.col("to_part").alias("part"), "vid", "rank")
            )
            msgs_in = state.select("part", "vid", "rank").unionByName(reps)

        out = msgs_in.groupBy("part").applyInPandas(kernel, _OUT_SCHEMA).persist()
        side = out.filter(F.col("kind") == 1).collect()
        dang = float(sum(r["c"] for r in side))
        total_contrib = float(sum(r["r_old"] for r in side))

        new_state = (
            out.filter(F.col("kind") == 0)
            .select(
                "part",
                "vid",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha) * (F.col("c") + F.lit(dang / n))
                ).alias("rank"),
                F.col("r_old"),
            )
            .withColumn("_delta", F.abs(F.col("rank") - F.col("r_old")))
            .withColumn("_changed", F.col("rank") != F.col("r_old"))
            .drop("r_old")
            .localCheckpoint(eager=True)
        )
        agg = new_state.agg(
            F.max("_delta").alias("max_delta"),
            F.sum((F.col("_delta") > tol).cast("long")).alias("frontier"),
        ).first()
        out.unpersist()
        max_delta = float(agg["max_delta"] or 0.0)
        frontier = int(agg["frontier"] or 0)

        lineage = spark.createDataFrame(
            [
                (
                    algo_name,
                    it,
                    int(r["part"]),
                    blocks_meta.get(int(r["part"]), 0),
                    blocks_meta.get(int(r["part"]), 0),
                    frontier,
                    blocks_meta.get(int(r["part"]), 0) / mean_edges,
                )
                for r in side
            ],
            schema="algo string, iteration int, partition_id int, "
            "edges_scanned long, messages_sent long, frontier_size long, "
            "skew_ratio double",
        )
        metrics = {
            "max_delta": max_delta,
            "frontier": frontier,
            "dangling_mass": dang,
            "total_contrib": total_contrib,
            "converged": max_delta < tol,
        }
        return StepOutcome(new_state.drop("_delta"), lineage, metrics)

    result = run_loop(spark, algo_name, cfg, init_state, step, resume=resume)
    placement.unpersist()
    # canonical (vid, rank) shape
    state = result.state
    if "part" in state.columns:
        state = state.select("vid", "rank")
    return LoopResult(
        state, result.history, result.iterations, result.converged,
        result.resumed_from,
    )
