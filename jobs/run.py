"""Production job entry — the engine's ``spark-submit`` target
(SURVEY.md §3.4)::

    spark-submit --py-files crgp_spark.zip jobs/run.py \\
        --algo pagerank --edges <parquet> --checkpoint <dir> [--resume]

Locally (this sandbox) it builds its own ``local[N]`` session. On a
real cluster, ``spark-submit`` conf overrides the master/parallelism
and the same code runs unchanged — partitioning is fixed by
``--partitions`` (the data-layout constant), parallelism by the cluster.

Also the worker process for scripts/bench_scaling.py: prints exactly
one JSON result line on stdout.

Subcommands per --algo:
  derive      transcripts parquet -> influence-edge parquet
  pagerank    CSR-kernel PageRank (delta checkpoints, lineage, resume)
  pagerank_df pure-DataFrame PageRank (JVM-only baseline)
  components  small-star/large-star connected components
  scc         strongly connected components (trim + FW-BW coloring)
  temporal_reach  earliest time-respecting arrival from seed vertices
              (edges parquet needs src,dst,t; seeds: src % 17 == 0)
  motifs      δ-temporal motif census (edges parquet needs src,dst,t;
              window via --motif-delta-us)
  triads      Holland-Leinhardt 16-class triad census (edges: src,dst)
  coreness    full k-core decomposition, core number per vertex
  hierarchy   parent-forest depth/root/subtree rollup (pointer doubling)
  msf         minimum spanning forest (Borůvka; 'w' column or unit weights)
  bridges     cut edges (BFS forest + LCA crossing counts, exact)
  ecc2        2-edge-connected components (min-vid label per class)
  blocks      biconnected components, block label per edge
  articulation  cut vertices (>= 2 incident blocks)
  anf         approximate neighborhood function (FM bitmask propagation)
  densest     densest-subgraph 4-approx peel curve (BKV rounds)
  labelprop   synchronous label propagation
  louvain     multi-level Louvain communities (IS-scheduled moves)
  triangles   exact triangle count
  bfs         multi-source BFS hops (sources: originator per conv)
  hits        HITS hubs/authorities (exact integer rounds)
  ktruss      k-truss by edge-support peeling
  linkpred    top-100 predicted links (common-neighbor family)
  domset      parallel-greedy dominating set ((span, -id) local maxima)
  fiedler     spectral bisection (deflated integer power iteration)
  onion       onion decomposition (k-core peel layers)
  cliques4    exact 4-clique count (degeneracy-oriented)
  generate    synthetic transcripts parquet (deterministic, seeded)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from crgp_spark.config import EngineConfig
from crgp_spark.validation import nonneg_int, positive_int


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True)
    ap.add_argument("--edges", help="edge-table parquet (src,dst[,...])")
    ap.add_argument("--transcripts", help="transcripts parquet (derive)")
    ap.add_argument("--output", help="output parquet (derive/generate)")
    ap.add_argument("--checkpoint", default="/tmp/crgp_job_ckpt")
    ap.add_argument("--cpus", type=positive_int, default=None)
    ap.add_argument(
        "--master",
        default=None,
        help="master override, e.g. local-cluster[8,4,8192] for 8 "
        "separate executor JVMs x 4 cores",
    )
    ap.add_argument("--executor-memory", default=None)
    ap.add_argument("--partitions", type=positive_int, default=32)
    ap.add_argument(
        "--graph-partitions",
        type=positive_int,
        default=None,
        help="graph block count override (default: --partitions); small "
        "values force multi-million-edge blocks to stress the kernels",
    )
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--tol-mode", default="abs", choices=["abs", "scaled"])
    ap.add_argument("--max-iterations", type=positive_int, default=100)
    ap.add_argument("--fixed-iterations", type=positive_int, default=None)
    ap.add_argument(
        "--motif-delta-us",
        type=positive_int,
        default=6 * 3600 * 1_000_000,
        help="temporal-motif window δ in microseconds (motifs)",
    )
    ap.add_argument("--checkpoint-every", type=positive_int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--k", type=positive_int, default=3, help="kcore k")
    ap.add_argument(
        "--n-convs", type=positive_int, default=100_000, help="generate size"
    )
    ap.add_argument(
        "--hub-threshold",
        type=positive_int,
        default=None,
        help="hub_degree_threshold override; low values force "
        "conversation splits (exercises the split-residue hybrid)",
    )
    ap.add_argument("--seed", type=nonneg_int, default=42)
    ap.add_argument("--input", help="input parquet (profile/scd2)")
    ap.add_argument("--columns", help="comma-separated columns (profile)")
    ap.add_argument("--key-col", default="user_id", help="scd2 key")
    ap.add_argument("--ts-col", default="ts", help="scd2 timestamp")
    ap.add_argument(
        "--tracked", default="event_type",
        help="comma-separated tracked columns (scd2)",
    )
    ap.add_argument(
        "--order-cols", default="",
        help="comma-separated tiebreak columns (scd2)",
    )
    args = ap.parse_args()

    from crgp_spark.session import get_spark

    extra = {}
    if args.executor_memory:
        extra["spark.executor.memory"] = args.executor_memory
    elif args.master and args.master.startswith("local-cluster["):
        # local-cluster[E,C,MEM]'s MEM is the WORKER capacity; executors
        # default to a 1g heap unless spark.executor.memory is set.
        # Default to capacity minus 1g headroom so the test cluster
        # behaves like a real one instead of silently running 1g heaps.
        try:
            worker_mib = int(args.master.rstrip("]").split(",")[2])
            extra["spark.executor.memory"] = f"{max(worker_mib - 1024, 512)}m"
        except (IndexError, ValueError):
            pass
    if args.master and "cluster" in args.master:
        # ship the engine to the executors — the --py-files flow the
        # north rule specifies (spark-submit --py-files crgp_spark.zip)
        import shutil
        import tempfile

        zip_base = os.path.join(tempfile.gettempdir(), "crgp_spark_pkg")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=repo, base_dir="crgp_spark"
        )
        extra["spark.submit.pyFiles"] = zip_path
    spark = get_spark(
        f"crgp_{args.algo}",
        cpus=args.cpus,
        shuffle_partitions=args.partitions,
        master=args.master,
        extra_conf=extra,
    )
    cfg = EngineConfig(
        shuffle_partitions=args.partitions,
        graph_partitions=args.graph_partitions or args.partitions,
        tol=args.tol,
        tol_mode=args.tol_mode,
        max_iterations=args.max_iterations,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.checkpoint,
    )
    if args.hub_threshold is not None:
        cfg.hub_degree_threshold = args.hub_threshold
    os.makedirs(args.checkpoint, exist_ok=True)
    out: dict = {"algo": args.algo}
    t0 = time.time()

    if args.algo == "generate":
        from crgp_spark.generator import synthetic_transcripts

        df = synthetic_transcripts(spark, n_convs=args.n_convs, seed=args.seed)
        df.write.mode("overwrite").parquet(args.output)
        out["rows"] = spark.read.parquet(args.output).count()

    elif args.algo == "derive":
        from crgp_spark.derive import derive_edges

        t = spark.read.parquet(args.transcripts)
        derive_edges(t).write.mode("overwrite").parquet(args.output)
        out["edges"] = spark.read.parquet(args.output).count()

    elif args.algo in ("pagerank", "pagerank_df", "pagerank_cascade"):
        from crgp_spark.operators.cascade import pagerank_cascade
        from crgp_spark.operators.pagerank import pagerank, pagerank_df
        from crgp_spark.stats import Statistics, Stopwatch

        sw = Stopwatch()
        stats = Statistics(configuration={
            "algorithm": args.algo, "partitions": args.partitions,
            "tol": args.tol, "tol_mode": args.tol_mode,
            "checkpoint_every": args.checkpoint_every,
        })
        stats.time_to_setup = sw.lap()
        full = spark.read.parquet(args.edges)
        edges = full.select("src", "dst")
        n_edges = edges.count()
        stats.number_of_friendships = n_edges
        stats.time_to_load_input = sw.lap()
        t0 = time.time()  # exclude the input count from the timed span
        if args.algo == "pagerank":
            res = pagerank(spark, edges, cfg, resume=args.resume)
            iters, converged = res.iterations, res.converged
        elif args.algo == "pagerank_cascade":
            res = pagerank_cascade(
                spark,
                full.select("src", "dst", "conv_id"),
                cfg,
                resume=args.resume,
            )
            iters, converged = res.iterations, res.converged
        else:
            ranks = pagerank_df(
                spark, edges, cfg, fixed_iterations=args.fixed_iterations
            )
            ranks.count()
            iters = args.fixed_iterations or cfg.max_iterations
            converged = args.fixed_iterations is None
        secs = time.time() - t0
        stats.number_of_retweets = n_edges * iters
        stats.time_to_process = sw.lap()
        stats.finish()
        with open(os.path.join(args.checkpoint, f"crgp_{args.algo}.toml"), "w") as f:
            f.write(stats.to_toml())
        out.update(
            edges=n_edges,
            iterations=iters,
            converged=converged,
            seconds=round(secs, 3),
            edges_per_sec=round(n_edges * iters / secs),
            processing_rate=stats.processing_rate,
        )

    elif args.algo == "components":
        from crgp_spark.operators.components import connected_components

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = connected_components(spark, edges, cfg, resume=args.resume).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices_labeled=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "scc":
        from crgp_spark.operators.scc import strongly_connected_components

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = strongly_connected_components(spark, edges, cfg).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices_labeled=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "temporal_reach":
        from pyspark.sql import functions as F

        from crgp_spark.operators.temporalreach import earliest_arrival

        edges = spark.read.parquet(args.edges).select("src", "dst", "t")
        n_edges = edges.count()
        seeds = (
            edges.select(F.col("src").alias("vid"))
            .filter(F.col("vid") % 17 == 0)
            .distinct()
        )
        t0 = time.time()
        n = earliest_arrival(spark, edges, seeds, cfg).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices_reached=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "motifs":
        from pyspark.sql import functions as F

        from crgp_spark.operators.motifs import temporal_motif_counts

        inter = spark.read.parquet(args.edges).select(
            "src", "dst", F.col("t").alias("us")
        )
        n_edges = inter.count()
        t0 = time.time()
        row = temporal_motif_counts(inter, args.motif_delta_us).collect()[0]
        secs = time.time() - t0
        out.update(
            edges=n_edges,
            delta_us=row["delta_us"],
            pingpong=row["n_pingpong"],
            two_path=row["n_2path"],
            triangle=row["n_triangle"],
            seconds=round(secs, 3),
            edges_per_sec=round(n_edges / secs),
        )

    elif args.algo == "triads":
        from crgp_spark.operators.triads import triad_census

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        rows = triad_census(edges).collect()
        secs = time.time() - t0
        out.update(
            edges=n_edges,
            census={r["tclass"]: r["n_triads"] for r in rows},
            seconds=round(secs, 3),
            edges_per_sec=round(n_edges / secs),
        )

    elif args.algo == "coreness":
        from crgp_spark.operators.coreness import core_decomposition

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        rows = core_decomposition(spark, edges, cfg=cfg).collect()
        secs = time.time() - t0
        out.update(
            edges=n_edges,
            vertices=len(rows),
            max_core=max((r["core"] for r in rows), default=0),
            seconds=round(secs, 3),
            edges_per_sec=round(n_edges / secs),
        )

    elif args.algo == "hierarchy":
        from crgp_spark.operators.hierarchy import parent_tree, tree_stats

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        rows = tree_stats(spark, parent_tree(edges), cfg=cfg).collect()
        secs = time.time() - t0
        out.update(
            edges=n_edges,
            vertices=len(rows),
            max_depth=max((r["depth"] for r in rows), default=0),
            seconds=round(secs, 3),
            edges_per_sec=round(n_edges / secs),
        )

    elif args.algo == "densest":
        from crgp_spark.operators.densest import densest_curve

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        rows = densest_curve(
            spark, edges, rounds=args.fixed_iterations or 16, cfg=cfg
        ).collect()
        secs = time.time() - t0
        best = max(
            (r["n_edges"] / r["n_verts"] for r in rows if r["n_verts"]),
            default=0.0,
        )
        out.update(edges=n_edges, seconds=round(secs, 3),
                   best_density=round(best, 4),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "anf":
        from crgp_spark.operators.anf import anf

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        hops = args.fixed_iterations or 3
        curve = anf(spark, edges, hops=hops, cfg=cfg).collect()
        secs = time.time() - t0
        out.update(edges=n_edges, seconds=round(secs, 3),
                   curve={str(r["hop"]): r["sum_b"] for r in curve},
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "msf":
        from pyspark.sql import functions as F

        from crgp_spark.operators.msf import minimum_spanning_forest

        raw = spark.read.parquet(args.edges)
        # default weight = 1 when the table carries none (spanning
        # forest of the unweighted graph, ties broken by (u, v))
        if "w" in raw.columns:
            edges = raw.select("src", "dst", "w")
        else:
            edges = raw.select("src", "dst", F.lit(1).cast("long").alias("w"))
        n_edges = edges.count()
        t0 = time.time()
        n = minimum_spanning_forest(spark, edges, cfg).count()
        secs = time.time() - t0
        out.update(edges=n_edges, forest_edges=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "labelprop":
        from crgp_spark.operators.labelprop import label_propagation

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = label_propagation(
            spark, edges, cfg, resume=args.resume,
            fixed_iterations=args.fixed_iterations,
        )
        res.state.count()
        secs = time.time() - t0
        out.update(edges=n_edges, iterations=res.iterations,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges * res.iterations / secs))

    elif args.algo == "louvain":
        from crgp_spark.operators.louvain import louvain

        raw = spark.read.parquet(args.edges)
        wcol = "weight" if "weight" in raw.columns else None
        edges = raw.select(
            "src", "dst", *(["weight"] if wcol else [])
        )
        n_edges = edges.count()
        t0 = time.time()
        assign = louvain(
            spark, edges, cfg,
            levels=2,
            rounds=args.fixed_iterations or 4,
            weight_col=wcol,
        )
        n_comms = assign.select("comm").distinct().count()
        secs = time.time() - t0
        out.update(edges=n_edges, communities=n_comms,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "leiden":
        from crgp_spark.operators.louvain import leiden

        raw = spark.read.parquet(args.edges)
        wcol = "weight" if "weight" in raw.columns else None
        edges = raw.select(
            "src", "dst", *(["weight"] if wcol else [])
        )
        n_edges = edges.count()
        t0 = time.time()
        assign = leiden(
            spark, edges, cfg,
            levels=2,
            rounds=args.fixed_iterations or 4,
            weight_col=wcol,
        )
        n_comms = assign.select("comm").distinct().count()
        secs = time.time() - t0
        out.update(edges=n_edges, communities=n_comms,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "diameter":
        from crgp_spark.operators.diameter import component_diameters

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        d = component_diameters(spark, edges, cfg)
        from pyspark.sql import functions as F

        row = d.agg(
            F.count(F.lit(1)).alias("n_comps"),
            F.max("diameter").alias("max_diameter"),
        ).first()
        secs = time.time() - t0
        out.update(edges=n_edges, components=int(row["n_comps"]),
                   max_diameter=int(row["max_diameter"] or 0),
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "kcore":
        from crgp_spark.operators.kcore import kcore

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = kcore(
            spark, edges, k=args.k, fixed_rounds=args.fixed_iterations, cfg=cfg
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, k=args.k, core_vertices=n,
                   seconds=round(secs, 3), edges_per_sec=round(n_edges / secs))

    elif args.algo == "ktruss":
        from crgp_spark.operators.ktruss import ktruss

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = ktruss(
            spark, edges, k=args.k, fixed_rounds=args.fixed_iterations, cfg=cfg
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, k=args.k, truss_edges=n,
                   seconds=round(secs, 3), edges_per_sec=round(n_edges / secs))

    elif args.algo == "walks":
        from crgp_spark.operators.walks import hash_walks

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = hash_walks(
            spark, edges, steps=args.fixed_iterations or 4, cfg=cfg
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, walk_rows=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "mis":
        from crgp_spark.operators.mis import maximal_independent_set

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = maximal_independent_set(
            spark, edges, rounds=args.fixed_iterations or 4, cfg=cfg
        )
        from pyspark.sql import functions as F

        counts = {
            r["status"]: r["n"]
            for r in res.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        secs = time.time() - t0
        out.update(edges=n_edges, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs), **counts)

    elif args.algo == "domset":
        from crgp_spark.operators.domset import dominating_set

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = dominating_set(
            spark, edges, rounds=args.fixed_iterations or 4, cfg=cfg
        )
        from pyspark.sql import functions as F

        counts = {
            r["status"]: r["n"]
            for r in res.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        secs = time.time() - t0
        out.update(edges=n_edges, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs), **counts)

    elif args.algo == "fiedler":
        from crgp_spark.operators.fiedler import fiedler_vector

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = fiedler_vector(
            spark, edges, rounds=args.fixed_iterations or 4, cfg=cfg
        )
        from pyspark.sql import functions as F

        sides = {
            f"side_{r['side']}": r["n"]
            for r in res.groupBy("side").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        secs = time.time() - t0
        out.update(edges=n_edges, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs), **sides)

    elif args.algo == "onion":
        from crgp_spark.operators.coreness import onion_decomposition

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = onion_decomposition(
            spark, edges, rounds=args.fixed_iterations or 4, cfg=cfg
        )
        from pyspark.sql import functions as F

        n_layers = res.agg(F.max("layer")).collect()[0][0]
        n_open = res.filter(F.col("layer") == 0).count()
        secs = time.time() - t0
        out.update(edges=n_edges, layers=n_layers, open_vertices=n_open,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "cliques4":
        from crgp_spark.operators.triangles import four_cliques

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        total, _pv = four_cliques(spark, edges)
        secs = time.time() - t0
        out.update(edges=n_edges, k4=total, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "coloring":
        from crgp_spark.operators.coloring import greedy_coloring

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = greedy_coloring(
            spark, edges, rounds=args.fixed_iterations or 4, cfg=cfg
        )
        from pyspark.sql import functions as F

        agg = res.agg(
            F.count(F.lit(1)).alias("vertices"),
            F.max("color").alias("max_color"),
            F.sum((F.col("color") == -1).cast("long")).alias("open"),
        ).collect()[0]
        secs = time.time() - t0
        out.update(edges=n_edges, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs),
                   vertices=agg["vertices"], max_color=agg["max_color"],
                   open=int(agg["open"]))

    elif args.algo == "harmonic":
        from crgp_spark.operators.harmonic import (
            cascade_harmonic,
            harmonic_bounded,
        )

        full = spark.read.parquet(args.edges)
        n_edges = full.count()
        t0 = time.time()
        if "conv_id" in full.columns:
            res = cascade_harmonic(
                spark, full.select("src", "dst", "conv_id"),
                radius=args.fixed_iterations or 3, cfg=cfg,
            )
        else:
            res = harmonic_bounded(
                spark, full.select("src", "dst"),
                radius=args.fixed_iterations or 3, cfg=cfg,
            )
        n = res.count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "betweenness":
        from crgp_spark.operators.betweenness import betweenness_seeded

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = betweenness_seeded(
            spark, edges, n_seeds=8,
            radius=args.fixed_iterations or 4, cfg=cfg,
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, interior_vertices=n,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "virality":
        from crgp_spark.operators.virality import structural_virality

        full = spark.read.parquet(args.edges)
        if "conv_id" not in full.columns:
            raise SystemExit("virality needs a conv_id edge column")
        n_edges = full.count()
        t0 = time.time()
        n = structural_virality(
            spark, full.select("src", "dst", "conv_id"),
            radius=args.fixed_iterations or 3, cfg=cfg,
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, conversations=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "sssp":
        from pyspark.sql import functions as F

        from crgp_spark.operators.sssp import bounded_sssp

        full = spark.read.parquet(args.edges)
        edges = full.select(
            "src", "dst",
            (full["w"] if "w" in full.columns else F.lit(1))
            .cast("long").alias("w"),
        )
        n_edges = edges.count()
        # deterministic 64-seed source set (md5-smallest vids)
        srcs = (
            edges.select(F.col("src").alias("vid")).distinct()
            .orderBy(F.md5(F.col("vid").cast("string"))).limit(64)
        )
        t0 = time.time()
        n = bounded_sssp(
            spark, edges, srcs,
            rounds=args.fixed_iterations or 4, cfg=cfg,
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, reached=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "linkpred":
        from crgp_spark.operators.linkpred import top_predicted_links

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = top_predicted_links(edges, k=100, min_common=2).count()
        secs = time.time() - t0
        out.update(edges=n_edges, predicted=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "summary":
        from crgp_spark.operators.graphstats import graph_summary

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        row = graph_summary(edges).collect()[0]
        secs = time.time() - t0
        out.update(edges=n_edges, seconds=round(secs, 3), **row.asDict())

    elif args.algo == "bridges":
        from crgp_spark.operators.bridges import bridges as bridges_op

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = bridges_op(spark, edges, cfg).count()
        secs = time.time() - t0
        out.update(edges=n_edges, bridges=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "ecc2":
        from crgp_spark.operators.bridges import two_edge_components

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = two_edge_components(spark, edges, cfg).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "blocks":
        from crgp_spark.operators.blocks import blocks as blocks_op

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        res = blocks_op(spark, edges, cfg)
        n_blocks = res.select("block").distinct().count()
        secs = time.time() - t0
        out.update(edges=n_edges, blocks=n_blocks, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "articulation":
        from crgp_spark.operators.blocks import articulation_points

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = articulation_points(spark, edges, cfg).count()
        secs = time.time() - t0
        out.update(edges=n_edges, cut_vertices=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "triangles":
        from crgp_spark.operators.triangles import triangles

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        total, _pv = triangles(spark, edges, cfg)
        secs = time.time() - t0
        out.update(edges=n_edges, triangles=total, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "bfs":
        from crgp_spark.operators.bfs import bfs_hops
        from pyspark.sql import functions as F

        full = spark.read.parquet(args.edges)
        edges = full.select("src", "dst")
        n_edges = edges.count()
        # source set: one originator per conversation if the edge table
        # carries conv_id, else every vertex with no in-edges
        if "conv_id" in full.columns:
            sources = full.groupBy("conv_id").agg(F.min("src").alias("vid"))
            sources = sources.select("vid")
        else:
            sources = (
                edges.select(F.col("src").alias("vid"))
                .distinct()
                .join(
                    edges.select(F.col("dst").alias("vid")).distinct(),
                    "vid",
                    "left_anti",
                )
            )
        t0 = time.time()
        reached = bfs_hops(
            spark, edges, sources, cfg,
            max_iterations=args.fixed_iterations,
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices_reached=reached,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "hits":
        from crgp_spark.operators.hits import hits

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        iters = args.fixed_iterations or 2
        t0 = time.time()
        n = hits(spark, edges, cfg, fixed_iterations=iters).count()
        secs = time.time() - t0
        out.update(edges=n_edges, iterations=iters, vertices_scored=n,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges * iters / secs))

    elif args.algo == "salsa":
        from crgp_spark.operators.salsa import salsa

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        iters = args.fixed_iterations or 2
        t0 = time.time()
        n = salsa(spark, edges, cfg, fixed_iterations=iters).count()
        secs = time.time() - t0
        out.update(edges=n_edges, iterations=iters, vertices_scored=n,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges * iters / secs))

    elif args.algo == "eigencent":
        from crgp_spark.operators.eigencent import eigenvector_centrality

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        iters = args.fixed_iterations or 3
        t0 = time.time()
        n = eigenvector_centrality(
            spark, edges, cfg, fixed_iterations=iters
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, iterations=iters, vertices_scored=n,
                   seconds=round(secs, 3),
                   edges_per_sec=round(n_edges * iters / secs))

    elif args.algo == "ic_sim":
        from crgp_spark.operators.icsim import independent_cascade

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        act = independent_cascade(
            spark, edges, p_num=3, p_den=10, n_seeds=args.k or 20,
            rounds=args.fixed_iterations or 4, cfg=cfg,
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, activated=act, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "temporal_pr":
        from crgp_spark.operators.temporalpr import temporal_pagerank
        from pyspark.sql import functions as F

        full = spark.read.parquet(args.edges)
        if "ts" not in full.columns:
            raise SystemExit("temporal_pr needs a ts edge column")
        edges = full.select(
            "src", "dst", F.col("ts").cast("long").alias("t")
        )
        n_edges = edges.count()
        t0 = time.time()
        n = temporal_pagerank(
            spark, edges, max_len=args.fixed_iterations or 3, cfg=cfg
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "bursts":
        from pyspark.sql import functions as F

        from crgp_spark.functions import ts_micros
        from crgp_spark.operators.bursts import burst_detect

        ev = spark.read.parquet(args.edges).select(
            F.col("user_id").alias("uid"), ts_micros("ts").alias("us")
        ).select("uid", F.expr("CAST(us div 1000 AS BIGINT)").alias("t"))
        n_rows = ev.count()
        t0 = time.time()
        n = burst_detect(ev).count()
        secs = time.time() - t0
        out.update(events=n_rows, keys=n, seconds=round(secs, 3),
                   rows_per_sec=round(n_rows / secs))

    elif args.algo == "closeness":
        from crgp_spark.operators.harmonic import closeness_bounded

        edges = spark.read.parquet(args.edges).select("src", "dst")
        n_edges = edges.count()
        t0 = time.time()
        n = closeness_bounded(
            spark, edges, radius=args.fixed_iterations or 3, cfg=cfg
        ).count()
        secs = time.time() - t0
        out.update(edges=n_edges, vertices=n, seconds=round(secs, 3),
                   edges_per_sec=round(n_edges / secs))

    elif args.algo == "butterflies":
        from crgp_spark.derive import prepare_turns
        from crgp_spark.generator import transcripts_from_events
        from crgp_spark.operators.butterfly import butterfly_counts

        events = spark.read.parquet(args.edges)
        t = prepare_turns(transcripts_from_events(events))
        n_rows = t.count()
        t0 = time.time()
        n = butterfly_counts(t, side="participant").count()
        secs = time.time() - t0
        out.update(membership_rows=n_rows, vertices=n,
                   seconds=round(secs, 3),
                   rows_per_sec=round(n_rows / secs))

    elif args.algo in (
        "cascade_components", "cascade_labelprop", "cascade_triangles"
    ):
        # cascade-local one-pass kernels; pack timed separately (the
        # graph-load phase analog). --graph-partitions 4 at a ~10^7-edge
        # input forces multi-million-edge blocks — the kernel-scale
        # stress cell VERDICT r1 asked for.
        from crgp_spark.operators.cascade import pack_cascade
        from crgp_spark.operators.cascade_algos import (
            cascade_components,
            cascade_labelprop,
            cascade_triangles,
        )

        e3 = spark.read.parquet(args.edges).select("src", "dst", "conv_id")
        n_edges = e3.count()
        pack_path = os.path.join(args.checkpoint, args.algo, "graph")
        t0 = time.time()
        pstats = pack_cascade(e3, cfg, pack_path)
        pack_secs = time.time() - t0
        t0 = time.time()
        if args.algo == "cascade_components":
            n = cascade_components(
                spark, e3, cfg, pack_path=pack_path, reuse_pack=True
            ).count()
            out["vertices_labeled"] = n
        elif args.algo == "cascade_labelprop":
            n = cascade_labelprop(
                spark, e3, cfg, pack_path=pack_path, reuse_pack=True,
                fixed_iterations=args.fixed_iterations,
            ).count()
            out["vertices_labeled"] = n
        else:
            total, _pv = cascade_triangles(
                spark, e3, cfg, pack_path=pack_path, reuse_pack=True
            )
            out["triangles"] = total
        secs = time.time() - t0
        out.update(
            edges=n_edges,
            max_block_edges=pstats["max_edges"],
            pack_seconds=round(pack_secs, 3),
            seconds=round(secs, 3),
            edges_per_sec=round(n_edges / secs),
        )

    elif args.algo == "profile":
        from crgp_spark.operators.profile import profile_table

        if not args.input:
            raise SystemExit("--algo profile requires --input")
        df = spark.read.parquet(args.input)
        cols = args.columns.split(",") if args.columns else None
        t0 = time.time()
        rows = profile_table(df, cols).collect()
        secs = time.time() - t0
        out.update(
            seconds=round(secs, 3),
            profile={
                r["column"]: {
                    "n_rows": r["n_rows"],
                    "n_nulls": r["n_nulls"],
                    "n_distinct": r["n_distinct"],
                    "min": r["min_value"],
                    "max": r["max_value"],
                }
                for r in rows
            },
        )

    elif args.algo == "scd2":
        from crgp_spark.operators.scd import scd2_history

        if not args.input:
            raise SystemExit("--algo scd2 requires --input")
        df = spark.read.parquet(args.input)
        order = [c for c in args.order_cols.split(",") if c]
        t0 = time.time()
        hist = scd2_history(
            df, args.key_col, args.ts_col, args.tracked.split(","),
            order_cols=order,
        )
        if args.output:
            hist.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
        else:
            n = hist.count()
        secs = time.time() - t0
        out.update(versions=n, seconds=round(secs, 3))

    else:
        raise SystemExit(f"unknown --algo {args.algo}")

    out["total_seconds"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
