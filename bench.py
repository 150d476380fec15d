"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "bench_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "edges_per_sec_pagerank": ...,  # the BASELINE.json north metric
     ...}

The stdout line is size-capped (~1.4 KB) so it survives the driver's
tail-capture window (VERDICT r3 finding: the r03 line outgrew the
~2000-char pipe and ``BENCH_r03.json.parsed`` came back null). When the
suite has more cells than fit, the line keeps the slowest cells, folds
the rest into ``queries_omitted``/``queries_omitted_sec``, and the FULL
artifact (every cell, ``raw_runs``, control probes) is always written to
``BENCH_FULL.json`` next to this file (committed per round).

Measurement protocol (VERDICT r2): this sandbox's wall-times vary ±40%
between identical runs (noisy neighbors, JIT warmup), so a single JVM's
numbers recorded into ``BENCH_rNN.json`` can masquerade as a regression
— or hide one. The default invocation therefore spawns
``$SPARK_GRAFT_BENCH_REPS`` (default 2) SEPARATE child JVMs, each
running the full suite, and emits best-of per cell; every child's raw
timings are kept in ``raw_runs`` and a raw-CPU control probe
(single-process numpy matmul, no Spark) brackets each child so a noisy
window is visible in the artifact itself (``control.spread`` = max/min
probe seconds; >1.3 means the host was unstable during the run).
``--single`` runs one JVM (the child mode; use it when an external
harness applies its own repeat-and-best protocol).

The authoritative metric (BASELINE.json): edges-processed/sec to
PageRank convergence (max per-vertex delta < 1e-6) on the
transcript-derived influence-edge table = n_edges x supersteps / wall
seconds of the superstep loop (pack/labeling excluded, as the
reference's retweet_processing_rate excludes graph-load time,
crgp-lib/src/statistics.rs:125-131).

Scaling evidence (two-cluster-size criterion): run this file twice via
scripts/bench_scaling.py with SPARK_GRAFT_CPUS=8 and =32.

Usage: python bench.py [--single] [--queries name1,name2] [--json-file PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.derive import derive_edges
from crgp_spark.generator import transcripts_from_events
from crgp_spark.operators.components import connected_components
from crgp_spark.operators.dedup import minhash_dedup
from crgp_spark.operators.labelprop import label_propagation
from crgp_spark.operators.pagerank import pagerank, pagerank_df
from crgp_spark.operators.similarity import knn_bruteforce
from crgp_spark.operators.textstats import quality_score
from crgp_spark.operators.triangles import triangles
from crgp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CKPT = os.environ.get("SPARK_GRAFT_CKPT", "/tmp/crgp_bench_ckpt")


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

#: cells that are timings (merge = min across reps); every other numeric
#: extra is a rate (merge = max) or a constant (first rep wins).
_RATE_PREFIXES = ("edges_per_sec", "derive_events_per_sec", "derive_edges_per_sec")


def _cpu_control() -> float:
    """Raw-CPU probe: fixed single-process numpy workload, no Spark.
    Seconds; run before each child JVM so host noise during the bench
    window is recorded alongside the numbers it may have distorted."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((512, 512))
    for _ in range(20):  # untimed warmup: BLAS thread pool + page faults
        a = a @ a
        a /= np.abs(a).max() + 1.0
    t0 = time.time()
    for _ in range(300):
        a = a @ a
        a /= np.abs(a).max() + 1.0
    return round(time.time() - t0, 3)


def _merge_runs(runs: list[dict]) -> dict:
    """Best-of merge: min per timing cell, max per rate, first per
    constant; total = sum of best cells (what a quiet host would have
    delivered in one run)."""
    best = dict(runs[0])
    q = {}
    for name in runs[0]["queries"]:
        q[name] = min(r["queries"][name] for r in runs if name in r["queries"])
    best["queries"] = q
    best["value"] = round(sum(q.values()), 3)
    for k, v in runs[0].items():
        if isinstance(v, (int, float)) and k.startswith(_RATE_PREFIXES):
            best[k] = max(r[k] for r in runs if k in r)
    return best


#: stdout budget for the one-line summary. The driver records only the
#: last ~2000 chars of bench stdout; staying well under that guarantees
#: the line lands complete no matter what else was printed before it.
_LINE_BUDGET = 1400

FULL_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL.json")


def _compact_line(out: dict) -> str:
    """One JSON line <= _LINE_BUDGET bytes: headline numbers + as many
    of the slowest cells as fit; the rest folded into queries_omitted.
    Full detail always lives in BENCH_FULL.json."""
    base = {k: v for k, v in out.items() if k not in ("raw_runs", "control")}
    if "control" in out:
        base["control_spread"] = out["control"]["spread"]
    cells = sorted(out["queries"].items(), key=lambda kv: -kv[1])
    for keep in range(len(cells), -1, -1):
        kept = dict(sorted(((k, round(v, 2)) for k, v in cells[:keep])))
        line = dict(base)
        line["queries"] = kept
        if keep < len(cells):
            line["queries_omitted"] = len(cells) - keep
            line["queries_omitted_sec"] = round(
                sum(v for _, v in cells[keep:]), 2)
            line["full_json"] = "BENCH_FULL.json"
        s = json.dumps(line, separators=(",", ":"))
        if len(s) <= _LINE_BUDGET:
            return s
    return json.dumps({"metric": out.get("metric"), "value": out.get("value"),
                       "unit": out.get("unit")}, separators=(",", ":"))


def _emit(out: dict, json_file: str, write_full: bool = True) -> None:
    full = json.dumps(out)
    if write_full:
        with open(FULL_JSON, "w") as f:
            f.write(full + "\n")
    if json_file:
        with open(json_file, "w") as f:
            f.write(full + "\n")
    print(_compact_line(out))


def _orchestrate(args) -> None:
    import subprocess
    import tempfile

    runs, controls = [], []
    for i in range(max(REPS, 1)):
        controls.append(_cpu_control())
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            tmp = tf.name
        cmd = [sys.executable, os.path.abspath(__file__), "--single",
               "--json-file", tmp]
        if args.queries:
            cmd += ["--queries", args.queries]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
            raise SystemExit(f"bench child {i} failed (exit {r.returncode})")
        with open(tmp) as f:
            runs.append(json.load(f))
        os.unlink(tmp)
    controls.append(_cpu_control())

    out = _merge_runs(runs)
    out["reps"] = len(runs)
    out["raw_runs"] = [
        {"value": r["value"], "queries": r["queries"]} for r in runs
    ]
    out["control"] = {
        "probe_sec": controls,
        "spread": round(max(controls) / max(min(controls), 1e-9), 3),
    }
    _emit(out, args.json_file)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true",
                    help="one JVM, one pass (child / scaling-harness mode)")
    ap.add_argument("--queries", default="", help="comma-separated subset")
    ap.add_argument("--json-file", default="", help="also write JSON here")
    args = ap.parse_args()
    if not args.single:
        _orchestrate(args)
        return
    only = {q for q in args.queries.split(",") if q}

    shutil.rmtree(CKPT, ignore_errors=True)
    spark = get_spark("crgp_bench", cpus=CPUS, shuffle_partitions=CPUS)
    cfg = EngineConfig(
        shuffle_partitions=CPUS,
        graph_partitions=CPUS,
        checkpoint_dir=CKPT,
        checkpoint_every=1,  # north rule: delta checkpoint every superstep
        # scale-free convergence: max |delta| * n < 1e-6. The absolute
        # criterion is meaningless at bench scale (every score < 1e-5,
        # so |delta| < 1e-6 after ~2 supersteps); the scaled criterion
        # iterates until the scores themselves are resolved (~alpha^k
        # decay, i.e. a real convergence workload at any graph size).
        tol_mode="scaled",
        max_iterations=120,
    )

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    timings: dict[str, float] = {}
    extra: dict[str, float | int] = {"cpus": CPUS}

    def timed(name: str, fn):
        if only and name not in only:
            return None
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    transcripts = transcripts_from_events(events)

    # --- derivation: transcripts -> influence-edge table (the CRGP core)
    edges_path = os.path.join(CKPT, "edges")

    def run_derive():
        derive_edges(transcripts).write.mode("overwrite").parquet(edges_path)
        return spark.read.parquet(edges_path)

    edges = timed("derive_edges", run_derive)
    if edges is None:  # subset run still needs the edge table
        derive_edges(transcripts).write.mode("overwrite").parquet(edges_path)
        edges = spark.read.parquet(edges_path)
    n_edges = edges.count()
    n_events = events.count()
    extra["n_edges"] = n_edges
    if "derive_edges" in timings:
        # reference-comparable rate: events (retweet analogs) per second
        extra["derive_events_per_sec"] = round(n_events / timings["derive_edges"])
        extra["derive_edges_per_sec"] = round(n_edges / timings["derive_edges"])

    e2 = edges.select("src", "dst")

    # --- pack phase (graph load analog; timed separately like the
    # reference's social-graph-load stopwatch lap, statistics.rs:24-37)
    from crgp_spark.operators.pack import pack_csr

    pack_path = os.path.join(CKPT, "pagerank", "graph")
    pstats = timed("pack_csr", lambda: pack_csr(e2, cfg, pack_path))
    if pstats is not None:
        extra["pack_skew_ratio"] = round(pstats["skew_ratio"], 3)

    # --- PageRank to convergence (THE BASELINE.json metric), CSR-kernel path
    def run_pr():
        res = pagerank(spark, e2, cfg, reuse_pack=True)
        return res

    res = timed("pagerank_converged", run_pr)
    if res is not None:
        extra["pagerank_iterations"] = res.iterations
        extra["pagerank_converged"] = bool(res.converged)
        extra["edges_per_sec_pagerank"] = round(
            n_edges * res.iterations / timings["pagerank_converged"]
        )

    # --- PageRank, cascade-local CSR blocks (conversation-partitioned;
    # zero-exchange supersteps — operators/cascade.py)
    from crgp_spark.operators.cascade import pack_cascade, pagerank_cascade

    e3 = edges.select("src", "dst", "conv_id")
    casc_path = os.path.join(CKPT, "pagerank_cascade", "graph")
    cstats = timed("pack_cascade", lambda: pack_cascade(e3, cfg, casc_path))
    if cstats is not None:
        extra["cascade_replicas"] = cstats["n_replicas"]

    def run_casc():
        return pagerank_cascade(spark, e3, cfg, reuse_pack=True)

    cres = timed("pagerank_cascade", run_casc)
    if cres is not None:
        extra["edges_per_sec_pagerank_cascade"] = round(
            n_edges * cres.iterations / timings["pagerank_cascade"]
        )

    # --- PageRank, pure-JVM DataFrame path (cross-check baseline)
    def run_pr_df():
        cfg_nockpt = EngineConfig(
            shuffle_partitions=CPUS, graph_partitions=CPUS, checkpoint_dir=CKPT
        )
        ranks = pagerank_df(spark, e2, cfg_nockpt, fixed_iterations=10)
        ranks.count()
        return 10

    it_df = timed("pagerank_df_10it", run_pr_df)
    if it_df is not None:
        extra["edges_per_sec_pagerank_df"] = round(
            n_edges * it_df / timings["pagerank_df_10it"]
        )

    timed("components", lambda: connected_components(spark, e2, cfg).count())

    from crgp_spark.operators.icsim import live_edges as _live_edges

    def _percolation():
        live = _live_edges(e2, 1, 2, seed="perc")
        return (
            connected_components(spark, live, cfg)
            .groupBy("component").count()
            .groupBy("count").count().count()
        )

    timed("percolation", _percolation)
    timed(
        "labelprop_5it",
        lambda: label_propagation(spark, e2, cfg, fixed_iterations=5).state.count(),
    )
    timed("triangles", lambda: triangles(spark, e2)[0])

    # SCC on the cyclic actor-succession graph (min_weight=2 at sf0.1:
    # ~1.4k vertices, one 420-SCC + a 6-SCC + singleton tail — trim,
    # coloring and backward sweep all exercised)
    from crgp_spark.operators.scc import strongly_connected_components
    from crgp_spark.operators.transitions import succession_graph

    timed(
        "scc",
        lambda: strongly_connected_components(
            spark, succession_graph(events, min_weight=2), cfg,
            algo_name="scc_bench",
        ).count(),
    )

    # temporal earliest-arrival reachability over the first-day
    # succession edges, seeds released at their own first event
    from crgp_spark.functions import ts_micros
    from crgp_spark.operators.temporalreach import (
        earliest_arrival,
        temporal_edges,
    )

    def run_temporal():
        tedges = temporal_edges(
            events.filter(
                F.col("ts")
                < F.lit("2024-01-02 00:00:00").cast("timestamp_ntz")
            )
        )
        seeds = (
            events.filter(F.col("user_id") % 17 == 0)
            .groupBy(F.col("user_id").alias("vid"))
            .agg(F.min(ts_micros("ts")).alias("arrival"))
        )
        return earliest_arrival(spark, tedges, seeds, cfg).count()

    timed("temporal_reach", run_temporal)

    # δ-temporal motif census: vertex equi-joins + δ residual, exact
    # BIGINT counts (operators/motifs.py)
    def run_motifs():
        from crgp_spark.operators.motifs import (
            temporal_interactions,
            temporal_motif_counts,
        )

        return temporal_motif_counts(
            temporal_interactions(events), 6 * 3600 * 1_000_000
        ).count()

    timed("motifs", run_motifs)

    # Holland-Leinhardt triad census on the weight>=2 succession graph
    def run_triads():
        from crgp_spark.operators.triads import triad_census

        g = succession_graph(events, min_weight=2)
        return triad_census(g.select("src", "dst")).count()

    timed("triads", run_triads)

    # full core decomposition via h-index rounds on the same graph
    def run_coreness():
        from crgp_spark.operators.coreness import core_decomposition

        g = succession_graph(events, min_weight=2)
        return core_decomposition(spark, g.select("src", "dst"), cfg=cfg).count()

    timed("coreness", run_coreness)

    # CUSUM drift chart: one window pass over per-type value cents
    def run_cusum():
        from crgp_spark.functions import ts_micros
        from crgp_spark.operators.cusum import cusum_chart

        ev = events.withColumn(
            "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        return cusum_chart(
            ev, ["event_type"], [ts_micros("ts"), "event_id"],
            F.col("cents"), k_num=4800, k_den=1, h_num=50000, h_den=1,
        ).count()

    timed("cusum", run_cusum)

    # rich-club curve: two degree histograms suffix-summed on the spine
    def run_richclub():
        from crgp_spark.operators.richclub import rich_club
        from crgp_spark.operators.transitions import succession_graph

        g = succession_graph(events, min_weight=2)
        return rich_club(g.select("src", "dst")).count()

    timed("richclub", run_richclub)

    # directed mixing + modularity of the hash partition, both over
    # the succession graph (exact-moment scan-shaped aggregates)
    from crgp_spark.operators.graphstats import mixing_stats, modularity

    timed(
        "graph_mixing",
        lambda: mixing_stats(
            succession_graph(events, min_weight=2)
        ).count(),
    )

    def run_modularity():
        g = succession_graph(events, min_weight=2)
        verts = (
            g.select(F.col("src").alias("vid"))
            .unionByName(g.select(F.col("dst").alias("vid")))
            .distinct()
        )
        labels = verts.select(
            "vid", F.pmod(F.col("vid"), F.lit(8)).cast("long").alias("label")
        )
        return modularity(g, labels).count()

    timed("modularity", run_modularity)

    # cascade-local variants (same results, in-block kernels; share the
    # cascade pack built above)
    from crgp_spark.operators.cascade_algos import (
        cascade_components,
        cascade_labelprop,
        cascade_triangles,
    )

    timed(
        "components_cascade",
        lambda: cascade_components(
            spark, e3, cfg, pack_path=casc_path, reuse_pack=True
        ).count(),
    )
    timed(
        "labelprop_cascade_5it",
        lambda: cascade_labelprop(
            spark, e3, cfg, fixed_iterations=5, pack_path=casc_path,
            reuse_pack=True,
        ).count(),
    )
    timed(
        "triangles_cascade",
        lambda: cascade_triangles(
            spark, e3, cfg, pack_path=casc_path, reuse_pack=True
        )[0],
    )

    # --- BFS + HITS (the round-3 traversal/ranking additions)
    from crgp_spark.operators.bfs import bfs_hops
    from crgp_spark.operators.cascade_algos import cascade_bfs
    from crgp_spark.operators.hits import hits as hits_op

    # natural source set: one originator per conversation (min vid)
    srcs = e3.groupBy("conv_id").agg(F.min("src").alias("vid"))
    timed("bfs", lambda: bfs_hops(spark, e2, srcs.select("vid"), cfg).count())
    timed("bfs_cascade", lambda: cascade_bfs(spark, e3, srcs, cfg).count())
    timed("hits_2it", lambda: hits_op(spark, e2, cfg, fixed_iterations=2).count())

    from crgp_spark.operators.katz import katz as katz_op

    timed("katz_3it", lambda: katz_op(spark, e2, cfg, fixed_iterations=3).count())

    # forced-split hybrid: same input with the hub threshold lowered so
    # the largest conversations salt across sub-blocks — exercises the
    # split-residue path (in-block kernels for unsplit conversations +
    # generic path for the residue only) and shows split inputs no
    # longer forfeit the cascade advantage (VERDICT r2 ask #4)
    import dataclasses

    # threshold at the ~99th percentile of conversation size: a few
    # hub conversations split, the rest stay in-block — the scenario
    # the hybrid exists for
    cfg_split = dataclasses.replace(
        cfg, hub_degree_threshold=320, max_salt=4
    )
    split_path = os.path.join(CKPT, "cascade_split", "graph")
    sstats = timed(
        "pack_cascade_split", lambda: pack_cascade(e3, cfg_split, split_path)
    )
    if sstats is not None:
        extra["cascade_split_replicas"] = sstats["n_replicas"]
    timed(
        "labelprop_cascade_split_5it",
        lambda: cascade_labelprop(
            spark, e3, cfg_split, fixed_iterations=5, pack_path=split_path,
            reuse_pack=True,
        ).count(),
    )
    timed(
        "triangles_cascade_split",
        lambda: cascade_triangles(
            spark, e3, cfg_split, pack_path=split_path, reuse_pack=True
        )[0],
    )

    # --- round-3 structural additions over the same edge table
    from crgp_spark.operators.graphstats import graph_summary
    from crgp_spark.operators.kcore import kcore as kcore_op

    timed("kcore_fixpoint", lambda: kcore_op(spark, e2, k=3, cfg=cfg).count())
    timed("graph_summary", lambda: graph_summary(e2).count())

    from crgp_spark.operators.linkpred import top_predicted_links

    timed(
        "linkpred_top100",
        lambda: top_predicted_links(e2, k=100, min_common=2).count(),
    )

    from crgp_spark.operators.ktruss import ktruss as ktruss_op

    timed("ktruss_fixpoint", lambda: ktruss_op(spark, e2, k=4, cfg=cfg).count())

    from crgp_spark.operators.ktruss import truss_decomposition

    timed(
        "truss_decomp",
        lambda: truss_decomposition(
            spark, e2, k_max=5, rounds_per_k=2, cfg=cfg
        ).count(),
    )

    from crgp_spark.operators.salsa import salsa as salsa_op

    timed(
        "salsa_2it",
        lambda: salsa_op(spark, e2, cfg, fixed_iterations=2).count(),
    )

    from crgp_spark.operators.eigencent import eigenvector_centrality

    timed(
        "eigencent_3it",
        lambda: eigenvector_centrality(
            spark, e2, cfg, fixed_iterations=3
        ).count(),
    )

    from crgp_spark.operators.pagerank import personalized_pagerank
    from crgp_spark.operators.sweepcut import sweep_cut

    def _sweep():
        srcs = e2.select(F.col("src").alias("vid")).distinct().orderBy(
            "vid"
        ).limit(8)
        ranks = personalized_pagerank(spark, e2, srcs, cfg,
                                      fixed_iterations=3)
        num = F.floor(F.col("rank") * 1_000_000.0 + F.lit(0.5)).cast("long")
        return sweep_cut(
            spark, e2, ranks.select("vid", num.alias("num")), 100
        ).count()

    timed("sweep_cut_top100", _sweep)

    from crgp_spark.operators.temporalpr import temporal_pagerank

    timed(
        "temporal_pr_l3",
        lambda: temporal_pagerank(
            spark,
            edges.select("src", "dst", F.col("ts").cast("long").alias("t")),
            max_len=3, damp_den=2, cfg=cfg,
        ).count(),
    )

    from crgp_spark.operators.icsim import independent_cascade

    timed(
        "ic_sim_4r",
        lambda: independent_cascade(
            spark, e2, p_num=3, p_den=10, n_seeds=20, rounds=4, cfg=cfg
        ).count(),
    )

    from crgp_spark.derive import prepare_turns
    from crgp_spark.operators.project import coparticipation

    timed(
        "coparticipation",
        lambda: coparticipation(prepare_turns(transcripts)).count(),
    )

    from crgp_spark.operators.butterfly import butterfly_counts

    timed(
        "butterflies",
        lambda: butterfly_counts(
            prepare_turns(transcripts), side="participant"
        ).count(),
    )

    # --- walk corpus, symmetry breaking, bounded centrality, GNN prep
    from crgp_spark.operators.walks import hash_walks

    timed("hash_walks_4", lambda: hash_walks(spark, e2, steps=4, cfg=cfg).count())

    from crgp_spark.operators.mis import maximal_independent_set

    timed(
        "mis_4r",
        lambda: maximal_independent_set(spark, e2, rounds=4, cfg=cfg).count(),
    )
    from crgp_spark.operators.coloring import greedy_coloring

    timed(
        "coloring_4r",
        lambda: greedy_coloring(spark, e2, rounds=4, cfg=cfg).count(),
    )

    from crgp_spark.operators.betweenness import betweenness_seeded

    timed(
        "betweenness_8s_r4",
        lambda: betweenness_seeded(
            spark, e2, n_seeds=8, radius=4, cfg=cfg
        ).count(),
    )

    from crgp_spark.operators.harmonic import cascade_harmonic

    timed(
        "harmonic_cascade_r3",
        lambda: cascade_harmonic(spark, e3, radius=3, cfg=cfg).count(),
    )

    from crgp_spark.operators.harmonic import (
        closeness_bounded,
        closeness_cascade,
    )

    timed(
        "closeness_r3",
        lambda: closeness_bounded(spark, e2, radius=3, cfg=cfg).count(),
    )
    timed(
        "closeness_cascade_r3",
        lambda: closeness_cascade(spark, e3, radius=3, cfg=cfg).count(),
    )

    from crgp_spark.operators.matching import maximal_matching
    from crgp_spark.operators.sssp import bounded_sssp
    from crgp_spark.operators.virality import structural_virality

    timed(
        "matching_4r",
        lambda: maximal_matching(spark, e2, rounds=4, cfg=cfg).count(),
    )

    from crgp_spark.operators.matching import contract_matching

    def run_coarsen():
        m = maximal_matching(spark, e2, rounds=4, cfg=cfg)
        return contract_matching(spark, e2, m).count()

    timed("coarsen", run_coarsen)

    timed(
        "virality_r3",
        lambda: structural_virality(spark, e3, radius=3, cfg=cfg).count(),
    )
    timed(
        "sssp_4r",
        lambda: bounded_sssp(
            spark,
            e2.select("src", "dst", (F.lit(1)).cast("long").alias("w")),
            srcs.select("vid"),
            rounds=4,
            cfg=cfg,
        ).count(),
    )

    from crgp_spark.operators.featprop import neighborhood_mean

    timed(
        "featprop_2hop",
        lambda: neighborhood_mean(spark, e2, hops=2, cfg=cfg).count(),
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    timed("minhash_dedup", lambda: minhash_dedup(docs).count())

    from crgp_spark.operators.sampling import stratified_sample

    timed(
        "stratified_sample",
        lambda: stratified_sample(
            docs.select("doc_id", "source"), ["source"], 100, "doc_id"
        ).count(),
    )

    from crgp_spark.operators.dedup import duplicate_spans

    timed("dup_spans", lambda: duplicate_spans(docs).count())

    from crgp_spark.operators.bpetrain import bpe_train

    timed("bpe_train", lambda: bpe_train(docs, merges=5).count())

    from crgp_spark.operators.bpetrain import bpe_encode

    timed(
        "bpe_encode",
        lambda: bpe_encode(docs, bpe_train(docs, merges=5)).count(),
    )

    from crgp_spark.operators.dedup import setsim_join

    # shingled sets (the production AllPairs shape): prefix filtering
    # prunes on rarity, and this corpus's 30-word vocabulary makes
    # unigram sets the documented worst case (near-all-pairs)
    timed(
        "setsim_join",
        lambda: setsim_join(docs, threshold=(2, 3), shingle_k=3).count(),
    )
    timed("quality_score", lambda: quality_score(docs).count())

    from crgp_spark.functions import ts_micros
    from crgp_spark.operators.bursts import burst_detect

    timed(
        "bursts",
        lambda: burst_detect(
            events.select(
                F.col("user_id").alias("uid"),
                ts_micros("ts").alias("us"),
            ).select("uid", F.expr("CAST(us div 1000 AS BIGINT)").alias("t"))
        ).count(),
    )

    from crgp_spark.operators.evalmetrics import calibration_curve, roc_auc

    timed(
        "auc",
        lambda: roc_auc(
            docs, F.col("n_chars"), F.col("lang") == "en"
        ).count(),
    )
    timed(
        "calibration",
        lambda: calibration_curve(
            docs, F.col("n_chars"), F.col("lang") == "en", 200
        ).count(),
    )

    from crgp_spark.operators.inference import batch_inference

    timed(
        "inference",
        lambda: batch_inference(
            events, ["event_type", "user_id"], id_col="event_id"
        ).count(),
    )

    from crgp_spark.operators.curation import redact_pii
    from crgp_spark.operators.seqpack import sequence_pack

    # no PII matches in the synthetic corpus — this times the staged
    # regex chain itself at scan speed
    timed("redact_pii", lambda: redact_pii(docs).count())
    timed("seqpack", lambda: sequence_pack(docs, budget=256).count())

    from crgp_spark.operators.dedup import neardup_clusters
    from crgp_spark.operators.quantiles import value_quantiles
    from crgp_spark.operators.textstats import tfidf_topk

    timed("tfidf_topk", lambda: tfidf_topk(docs).count())

    from crgp_spark.operators.seqpack import chunk_documents
    from crgp_spark.operators.textstats import collocations

    timed(
        "chunking",
        lambda: chunk_documents(docs, chunk_tokens=32, overlap=8).count(),
    )
    timed(
        "collocations",
        lambda: collocations(docs, min_count=5, k_top=20).count(),
    )

    from crgp_spark.operators.curation import decontaminate, repetition_stats
    from crgp_spark.operators.sample import hash_sample

    timed(
        "decontaminate",
        lambda: decontaminate(
            docs, hash_sample(docs, "doc_id", 10).select("doc_id"), n=4
        ).count(),
    )
    timed("repetition_stats", lambda: repetition_stats(docs).count())

    from crgp_spark.operators.curation import remove_boilerplate

    timed(
        "boilerplate",
        lambda: remove_boilerplate(docs, seg_words=4, min_docs=2).count(),
    )
    timed(
        "neardup_clusters",
        lambda: neardup_clusters(spark, docs, cfg=cfg).count(),
    )
    timed("quantiles", lambda: value_quantiles(events).count())

    from crgp_spark.operators.sketch import kmv_distinct

    timed(
        "kmv_sketch",
        lambda: kmv_distinct(events, "event_type", "user_id", k=32).count(),
    )

    from crgp_spark.functions import ts_micros
    from crgp_spark.operators.fuzzy import fuzzy_pairs_ed1
    from crgp_spark.operators.layout import zorder_layout

    def run_zorder():
        ev = events.select(
            "event_id",
            F.col("user_id").cast("long").alias("a"),
            (ts_micros("ts") / 86_400_000_000).cast("long").alias("b"),
        )
        return zorder_layout(ev, "a", "b", "event_id").count()

    timed("zorder_keys", run_zorder)

    from crgp_spark.operators.transitions import transition_counts

    timed("transitions", lambda: transition_counts(events).count())
    timed(
        "fuzzy_ed1",
        lambda: fuzzy_pairs_ed1(
            events.select(
                F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("s")
            ).distinct()
        ).count(),
    )
    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    timed(
        "knn_bruteforce",
        lambda: knn_bruteforce(embs, embs.limit(64), k=10).count(),
    )
    from crgp_spark.operators.similarity import embedding_neardup_pairs, knn_ivf

    timed(
        "knn_ivf",
        lambda: knn_ivf(embs, embs.limit(64), k=10, n_centroids=16).count(),
    )
    timed(
        "embedding_neardup_lsh",
        lambda: embedding_neardup_pairs(
            embs, threshold=0.4, prefilter_bits=8, dim=64
        ).count(),
    )
    from crgp_spark.operators.kmeans import kmeans_step

    timed("kmeans_step", lambda: kmeans_step(embs, k=8).count())

    from crgp_spark.operators.semdedup import semantic_dedup

    timed(
        "semdedup",
        lambda: semantic_dedup(embs, k=8, threshold=0.40).count(),
    )

    from crgp_spark.operators.cms import heavy_hitters

    timed(
        "heavy_hitters",
        lambda: heavy_hitters(events, "user_id", k=20).count(),
    )

    from crgp_spark.operators.pq import knn_pq

    timed(
        "knn_pq",
        lambda: knn_pq(embs, embs.limit(64), k=10, m=4, n_codes=16).count(),
    )

    from crgp_spark.operators.cohort import cohort_retention, funnel_counts
    from crgp_spark.operators.featprop import neighbor_sample

    timed("cohort_retention", lambda: cohort_retention(events).count())
    timed("funnel", lambda: funnel_counts(events).count())
    timed("neighbor_sample", lambda: neighbor_sample(e2, fanout=5).count())

    # --- relational (TPC-H-shape) family over the warehouse tables
    from crgp_spark.operators import relational as rel

    tbl = {
        n: spark.read.parquet(os.path.join(SF_DIR, f"{n}.parquet"))
        for n in ("lineitem", "orders", "customer", "part", "supplier",
                  "nation", "region")
    }
    timed("tpch_pricing", lambda: rel.pricing_summary(tbl["lineitem"]).count())
    timed(
        "tpch_topk_orders",
        lambda: rel.topk_unshipped_orders(
            tbl["customer"], tbl["orders"], tbl["lineitem"]
        ).count(),
    )
    timed(
        "tpch_region_revenue",
        lambda: rel.region_revenue(
            tbl["customer"], tbl["orders"], tbl["lineitem"],
            tbl["supplier"], tbl["nation"], tbl["region"],
        ).count(),
    )
    timed(
        "tpch_smallqty",
        lambda: rel.small_quantity_revenue(tbl["lineitem"], tbl["part"]).count(),
    )
    timed(
        "tpch_window",
        lambda: rel.top_orders_per_segment(
            tbl["customer"], tbl["orders"]
        ).count(),
    )

    # bucketed co-located join: tables written once (untimed setup —
    # the pay-once placement shuffle), the cell times the
    # exchange-free SMJ + agg that every subsequent query gets free
    from crgp_spark.sources.bucketed import colocated_join, write_bucketed

    _bw = "/tmp/crgp_bench_bucketed"
    import shutil as _shutil

    _shutil.rmtree(_bw, ignore_errors=True)
    write_bucketed(tbl["orders"], "bench_bo", f"{_bw}/o", "o_custkey", 8)
    write_bucketed(tbl["customer"], "bench_bc", f"{_bw}/c", "c_custkey", 8)

    def _bucketed_join_cell():
        j = colocated_join(spark, "bench_bo", "bench_bc", "o_custkey", "c_custkey")
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        return (
            j.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("tc"))
            .count()
        )

    timed("bucketed_join", _bucketed_join_cell)

    # zone-map skipping: clustered write is untimed setup (layout.py's
    # pay-once job); the cell times manifest build + pruned interval scan
    from crgp_spark.sources.zonemaps import skipping_scan, zone_maps

    _zw = "/tmp/crgp_bench_zonemaps"
    _shutil.rmtree(_zw, ignore_errors=True)
    (
        events
        .repartitionByRange(16, "event_id")
        .sortWithinPartitions("event_id")
        .write.parquet(_zw)
    )

    def _zone_cell():
        maps = zone_maps(spark, _zw, "event_id")
        return skipping_scan(
            spark, _zw, "event_id", 2500, 4999, maps=maps
        ).count()

    timed("zone_skip", _zone_cell)

    from crgp_spark.operators.skyline import skyline2d

    def _skyline_cell():
        pts = tbl["orders"].select(
            F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        return skyline2d(pts, "day", "cents").count()

    timed("skyline", _skyline_cell)

    from crgp_spark.functions import ts_micros
    from crgp_spark.operators.ivm import maintain_rollup, rollup_view

    def _ivm_cell():
        base = tbl["customer"].select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("long").alias("bal_cents"),
            "c_mktsegment",
        )
        changes = events.select(
            (F.col("user_id") + 1).alias("c_custkey"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long").alias("bal_cents"),
            F.col("event_type").alias("c_mktsegment"),
            F.when(F.col("event_type") == "purchase", F.lit("D"))
            .otherwise(F.lit("U")).alias("op"),
            ts_micros(F.col("ts")).alias("v_us"),
            F.col("event_id").alias("v_seq"),
        )
        return maintain_rollup(
            base, changes, ["c_custkey"], ["v_us", "v_seq"],
            ["c_mktsegment"], "bal_cents",
            base_agg=rollup_view(base, ["c_mktsegment"], "bal_cents"),
        ).count()

    timed("ivm", _ivm_cell)

    from crgp_spark.operators.msf import minimum_spanning_forest

    def _msf_cell():
        we = e2.withColumn(
            "w", (F.pmod(F.col("dst"), F.lit(97)) + F.lit(1)).cast("long")
        )
        return minimum_spanning_forest(spark, we, cfg=cfg).count()

    timed("msf", _msf_cell)

    from crgp_spark.operators.bridges import bridges as bridges_op
    from crgp_spark.operators.bridges import two_edge_components

    timed("bridges", lambda: bridges_op(spark, e2, cfg).count())
    timed("ecc2", lambda: two_edge_components(spark, e2, cfg).count())

    from crgp_spark.operators.blocks import articulation_points
    from crgp_spark.operators.blocks import blocks as blocks_op

    timed("blocks", lambda: blocks_op(spark, e2, cfg).count())
    timed(
        "articulation", lambda: articulation_points(spark, e2, cfg).count()
    )

    from crgp_spark.operators.diameter import component_diameters

    timed(
        "diameter",
        lambda: component_diameters(spark, e2, cfg).count(),
    )

    from crgp_spark.operators.louvain import leiden as leiden_op

    timed(
        "leiden",
        lambda: leiden_op(spark, e2, cfg, levels=1, rounds=2).count(),
    )

    from crgp_spark.operators.wl import wl_refine

    timed("wl_2r", lambda: wl_refine(spark, e2, rounds=2, cfg=cfg).count())

    from crgp_spark.operators.anf import anf as anf_op
    from crgp_spark.operators.densest import densest_curve

    timed("anf_3hop", lambda: anf_op(spark, e2, hops=3, cfg=cfg).count())
    timed(
        "densest_peel",
        lambda: densest_curve(spark, e2, rounds=16, cfg=cfg).count(),
    )

    from crgp_spark.operators.hll import hll_distinct

    timed(
        "hll",
        lambda: hll_distinct(events, "event_type", "user_id", p=6).count(),
    )

    from crgp_spark.operators.regress import grouped_trend

    def _trend_cell():
        ev = events.select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long").alias("cents"),
        )
        return grouped_trend(ev, "user_id", F.col("day"),
                             F.col("cents")).count()

    timed("trend", _trend_cell)

    from crgp_spark.operators.regress import grouped_acf

    def _acf_cell():
        ev = events.select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_us"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long").alias("cents"),
        )
        return grouped_acf(
            ev, "user_id", [F.col("_us"), F.col("event_id")],
            F.col("cents"), lags=3,
        ).count()

    timed("acf", _acf_cell)

    from crgp_spark.operators.privacy import generalize_until_k

    def _kanon_cell():
        cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
        zero = F.lit(0).cast("long")
        nat = F.col("c_nationkey").cast("long")
        ladder = [
            {"seg": F.col("c_mktsegment"), "nat": nat,
             "bal": ((cents - cents % 100000) / 100000).cast("long")},
            {"seg": F.col("c_mktsegment"), "nat": nat - nat % 5,
             "bal": ((cents - cents % 1000000) / 1000000).cast("long")},
            {"seg": F.col("c_mktsegment"), "nat": zero, "bal": zero},
        ]
        _, classes = generalize_until_k(tbl["customer"], ladder, k=5)
        return classes.count()

    timed("kanon", _kanon_cell)

    from crgp_spark.operators.robust import mad_summary

    timed(
        "mad",
        lambda: mad_summary(
            events, "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        ).count(),
    )

    from crgp_spark.operators.timeseries import resample_ffill

    timed(
        "resample",
        lambda: resample_ffill(
            events, key="user_id", ts="ts",
            val=F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            seq="event_id",
        ).count(),
    )

    from crgp_spark.operators.bloomjoin import bloom_semi_join

    timed(
        "bloom_join",
        lambda: bloom_semi_join(
            tbl["lineitem"],
            tbl["orders"].where(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") > 150000.0)
            ),
            "l_orderkey",
            "o_orderkey",
        ).count(),
    )

    from crgp_spark.operators.attribution import attribute_conversions
    from crgp_spark.operators.histogram import hist_grouped_quantiles
    from crgp_spark.operators.profile import profile_table
    from crgp_spark.operators.scd import scd2_history

    timed(
        "profile",
        lambda: profile_table(
            events, ["event_id", "user_id", "event_type"]
        ).count(),
    )
    timed(
        "scd2",
        lambda: scd2_history(
            events, "user_id", "ts", ["event_type"], order_cols=["event_id"]
        ).count(),
    )
    timed("attribution", lambda: attribute_conversions(events).count())
    timed(
        "hist_quantiles",
        lambda: hist_grouped_quantiles(
            events,
            "event_type",
            "value",
            [10.0, 25.0, 50.0, 75.0, 100.0, 150.0, 200.0, 300.0],
            [0.25, 0.5, 0.9],
        ).count(),
    )

    from crgp_spark.operators.skewjoin import salted_join
    from crgp_spark.operators.streaks import longest_streaks

    timed("streaks", lambda: longest_streaks(events).count())

    from crgp_spark.operators.diff import table_diff
    from crgp_spark.operators.survivor import golden_records

    timed(
        "golden",
        lambda: golden_records(
            events, "user_id", "ts", ["event_id"],
            latest_cols=["event_type"], mode_cols=["event_type"],
        ).count(),
    )
    timed(
        "table_diff",
        lambda: table_diff(
            events,
            events.where(F.col("event_id") % 13 != 0),
            ["event_id"],
        ).count(),
    )

    from crgp_spark.functions import ts_micros
    from crgp_spark.operators.diff import apply_changes

    def _cdc_cell():
        base = tbl["customer"].select(
            "c_custkey", "c_name", "c_nationkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
            .alias("bal_cents"),
            "c_mktsegment",
        )
        ch = events.select(
            (F.col("user_id") + 1).alias("c_custkey"),
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("c_name"),
            (F.col("user_id") % 25).cast("int").alias("c_nationkey"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            .alias("bal_cents"),
            F.col("event_type").alias("c_mktsegment"),
            F.when(F.col("event_type") == "purchase", F.lit("D"))
            .otherwise(F.lit("U")).alias("op"),
            ts_micros(F.col("ts")).alias("v_us"),
            F.col("event_id").alias("v_seq"),
        )
        return apply_changes(
            base, ch, key_cols=["c_custkey"], order_cols=["v_us", "v_seq"]
        ).count()

    timed("cdc_apply", _cdc_cell)

    from crgp_spark.operators.train import logistic_train

    timed(
        "train_logistic",
        lambda: logistic_train(
            events.withColumn(
                "y", (F.col("event_type") == "purchase").cast("int")
            ),
            ["event_type", "user_id"], "y", "event_id",
            dim=16, rounds=3,
        ).count(),
    )

    from crgp_spark.operators.anomaly import rolling_anomalies

    timed("anomaly", lambda: rolling_anomalies(events).count())

    from crgp_spark.operators.shard import rendezvous_assign

    docs_tbl = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    timed("shards", lambda: rendezvous_assign(docs_tbl, "doc_id", 8).count())

    from crgp_spark.operators.discovery import (
        column_sketches,
        join_candidates,
    )
    from crgp_spark.operators.index import inverted_index
    from crgp_spark.operators.scd import scd2_history as _scd_hist
    from crgp_spark.operators.temporal import scd2_join

    def _scd2_join_cell():
        from crgp_spark.functions import ts_micros

        dim = _scd_hist(
            events, "user_id", "ts", ["event_type"], order_cols=["event_id"]
        )
        facts = events.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", ts_micros("ts").alias("us")
        )
        return scd2_join(facts, dim, "user_id", "us").count()

    timed("scd2_join", _scd2_join_cell)
    timed(
        "join_discovery",
        lambda: join_candidates(
            column_sketches(
                {
                    "customer.c_custkey": (tbl["customer"], "c_custkey"),
                    "orders.o_custkey": (tbl["orders"], "o_custkey"),
                    "orders.o_orderkey": (tbl["orders"], "o_orderkey"),
                    "lineitem.l_orderkey": (tbl["lineitem"], "l_orderkey"),
                },
                k=128,
            ),
            k=128,
        ).count(),
    )
    timed(
        "inverted_index",
        lambda: inverted_index(docs_tbl, max_postings=16).count(),
    )

    from crgp_spark.operators.index import keyword_search

    timed(
        "search",
        lambda: keyword_search(
            docs_tbl, ["join", "scan", "merge"], top_k=20
        ).count(),
    )

    from crgp_spark.operators.experiment import cuped_summary, srm_check

    timed("cuped", lambda: cuped_summary(events, split_day=19726).count())
    timed("srm", lambda: srm_check(events).count())

    from crgp_spark.operators.hierarchy import parent_tree, tree_stats

    timed(
        "hierarchy",
        lambda: tree_stats(spark, parent_tree(e2), cfg=cfg).count(),
    )

    from crgp_spark.operators.kcenter import kcenter_assign

    timed("kcenter_8", lambda: kcenter_assign(spark, embs, k=8).count())

    from crgp_spark.operators.textstats import token_entropy

    timed("entropy", lambda: token_entropy(docs).count())

    from crgp_spark.operators.lm import (
        dsir_weights,
        lm_score,
        nb_classify,
        nb_train,
        ngram_lm,
    )

    timed("lm_perplexity", lambda: lm_score(docs, ngram_lm(docs)).count())
    timed("nb_classify", lambda: nb_classify(docs, nb_train(docs)).count())
    timed(
        "dsir_weights",
        lambda: dsir_weights(docs, F.col("lang") == "en").count(),
    )

    from crgp_spark.operators.sample import weighted_sample

    timed(
        "weighted_sample",
        lambda: weighted_sample(
            docs_tbl, "lang", "doc_id", "n_chars", 40
        ).count(),
    )

    from crgp_spark.functions import ts_micros as _tsm
    from crgp_spark.operators.regress import theil_sen
    from crgp_spark.operators.timeseries import seasonal_decompose

    def _daily():
        return (
            events.withColumn(
                "cents",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            )
            .withColumn("us", _tsm("ts"))
            .withColumn("day", F.expr("us div 86400000000"))
            .groupBy("event_type", "day")
            .agg(F.sum("cents").alias("x"))
        )

    timed(
        "seasonal",
        lambda: seasonal_decompose(
            _daily(), ["event_type"], "day", "x"
        ).count(),
    )
    timed(
        "theil_sen",
        lambda: theil_sen(_daily(), "event_type", "day", "x").count(),
    )
    from crgp_spark.operators.cusum import pettitt_test
    from crgp_spark.operators.experiment import chi2_independence, ks_test
    from crgp_spark.operators.rankcorr import spearman_rho

    timed("ks_test", lambda: ks_test(events).count())
    timed("chi2", lambda: chi2_independence(events).count())

    from crgp_spark.operators.assoc import association_rules
    from crgp_spark.operators.experiment import did_estimate
    from crgp_spark.operators.gini import benford_audit, gini_coefficient
    from crgp_spark.operators.infotheory import (
        js_divergence,
        mutual_information,
        psi,
    )
    from crgp_spark.operators.regress import mann_kendall
    from crgp_spark.operators.survival import kaplan_meier

    timed("assoc", lambda: association_rules(events).count())
    timed("did", lambda: did_estimate(events, split_day=19726).count())

    def _gini_cell():
        per_user = (
            events.select(
                F.col("event_type").alias("g"),
                F.col("user_id").alias("u"),
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("c"),
            )
            .groupBy("g", "u")
            .agg(F.sum("c").alias("x"))
        )
        return gini_coefficient(per_user).count()

    timed("gini", _gini_cell)
    timed(
        "benford",
        lambda: benford_audit(
            events.select(
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("x")
            )
        ).count(),
    )
    timed(
        "mutual_info",
        lambda: mutual_information(
            events.select(
                "event_type",
                F.pmod(F.col("user_id"), F.lit(2))
                .cast("int")
                .alias("arm"),
            ),
            "event_type",
            "arm",
        ).count(),
    )
    timed(
        "jsd",
        lambda: js_divergence(docs, F.col("lang") == "en").count(),
    )

    def _psi_cell():
        b = (
            events.select(
                F.expr(
                    "unix_micros(CAST(ts AS TIMESTAMP))"
                    " div 86400000000"
                ).alias("day"),
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("c"),
            )
            .selectExpr("day", "c div 500 AS bucket")
        )
        return psi(
            b.filter(F.col("day") < 19726),
            b.filter(F.col("day") >= 19726),
        ).count()

    timed("psi", _psi_cell)

    def _mk_cell():
        d = _daily().groupBy("day").agg(F.sum("x").alias("x"))
        return mann_kendall(d, t_col="day", x_col="x").count()

    timed("mann_kendall", _mk_cell)

    def _km_cell():
        days = events.select(
            F.col("user_id").alias("u"),
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        pu = days.groupBy("u").agg(
            F.min("day").alias("fd"), F.max("day").alias("ld")
        )
        gm = pu.agg(F.max("ld").alias("gmax"))
        subj = pu.join(F.broadcast(gm)).select(
            (F.col("ld") - F.col("fd") + 1).cast("long").alias("dur"),
            F.when(F.col("ld") >= F.col("gmax") - 2, 0)
            .otherwise(1)
            .cast("int")
            .alias("ev"),
        )
        return kaplan_meier(subj).count()

    timed("kaplan_meier", _km_cell)

    from crgp_spark.operators.components import bipartite_check
    from crgp_spark.operators.dedup import hard_negatives
    from crgp_spark.operators.experiment import prop_test
    from crgp_spark.operators.graphstats import powerlaw_alpha
    from crgp_spark.operators.stump import stump_train

    timed("prop_test", lambda: prop_test(events).count())
    timed("powerlaw", lambda: powerlaw_alpha(e2, d_min=2).count())
    timed(
        "bipartite",
        lambda: bipartite_check(spark, e2, cfg, max_iterations=100).count(),
    )
    timed(
        "hard_negatives",
        lambda: hard_negatives(
            docs, n_hashes=4, band_size=1, per_anchor=5
        ).count(),
    )

    def _stump_cell():
        feats = (
            events.select(
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("c"),
                F.expr(
                    "unix_micros(CAST(ts AS TIMESTAMP))"
                ).alias("_us"),
                "user_id",
                "event_type",
            )
            .selectExpr(
                "c div 200 AS f_bucket",
                "(_us div 3600000000) % 24 AS f_hour",
                "user_id % 10 AS f_user",
                "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
                " AS y",
            )
        )
        return stump_train(
            feats, ["f_bucket", "f_hour", "f_user"], "y"
        ).count()

    timed("stump", _stump_cell)

    from crgp_spark.operators.regress import kendall_tau
    from crgp_spark.operators.sample import kfold_assign
    from crgp_spark.operators.textstats import heaps_fit

    timed(
        "kfold",
        lambda: kfold_assign(
            events,
            "user_id",
            k=5,
            label_expr=(F.col("event_type") == "purchase").cast("int"),
        ).count(),
    )

    def _tau_cell():
        d = _daily().groupBy("day").agg(
            F.sum("x").alias("x"), F.count(F.lit(1)).alias("y")
        )
        return kendall_tau(d, t_col="day").count()

    timed("kendall_tau", _tau_cell)
    timed("heaps", lambda: heaps_fit(docs).count())

    from crgp_spark.operators.evalmetrics import confusion_report
    from crgp_spark.operators.experiment import cramers_v, odds_ratio

    timed("cramers_v", lambda: cramers_v(events).count())
    timed("odds_ratio", lambda: odds_ratio(events).count())
    timed(
        "confusion",
        lambda: confusion_report(
            docs_tbl, "n_chars", F.col("lang") == "en", 1000
        ).count(),
    )

    def _spearman_cell():
        per_user = (
            events.select(
                F.col("user_id").alias("u"),
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("c"),
            )
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("x"), F.sum("c").alias("y"))
        )
        return spearman_rho(per_user).count()

    timed("spearman", _spearman_cell)
    timed(
        "pettitt",
        lambda: pettitt_test(
            _daily().groupBy("day").agg(F.sum("x").alias("x")),
            t_col="day",
            x_col="x",
        ).count(),
    )

    from crgp_spark.operators.coreness import onion_decomposition
    from crgp_spark.operators.domset import dominating_set
    from crgp_spark.operators.fiedler import fiedler_vector
    from crgp_spark.operators.graphstats import scan_statistic
    from crgp_spark.operators.triangles import four_cliques

    timed("ego_scan", lambda: scan_statistic(spark, e2).count())
    timed("cliques4", lambda: four_cliques(spark, e2)[1].count())
    timed(
        "domset_3r",
        lambda: dominating_set(spark, e2, rounds=3, cfg=cfg).count(),
    )
    timed(
        "fiedler_4r",
        lambda: fiedler_vector(spark, e2, rounds=4, cfg=cfg).count(),
    )
    timed(
        "onion_4r",
        lambda: onion_decomposition(spark, e2, rounds=4, cfg=cfg).count(),
    )

    timed(
        "salted_join",
        lambda: salted_join(
            tbl["orders"],
            tbl["customer"].withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey",
            n_salts=8,
        ).count(),
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extra,
    }
    # child / scaling-harness mode: full JSON goes to --json-file for the
    # parent; stdout still gets the size-capped line (a bare `--single`
    # invocation is also driver-safe). Don't clobber BENCH_FULL.json —
    # that's the orchestrator's merged artifact.
    _emit(out, args.json_file, write_full=False)
    spark.stop()


if __name__ == "__main__":
    main()
