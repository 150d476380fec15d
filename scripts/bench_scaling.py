"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real multi-node cluster exists in this sandbox, so per the driver
instruction the N -> 4N executor criterion is evidenced by running the
SAME jobs on the SAME input at two parallelism levels — ``local[8]`` vs
``local[32]`` (the host has 32 cores) — reporting throughput at both
plus efficiency ``eff = (tp@32 / tp@8) / 4``.

Protocol notes (all visible in the output JSON):
- every (job, level) cell is run ``--reps`` times ALTERNATING levels;
  the per-cell throughput is the MAX across reps (minimum-interference
  estimate — the sandbox host has noisy neighbors with 40%+ wall-time
  variance between identical runs).
- a raw-CPU control (pure Python multiprocessing burn) is measured the
  same way: it bounds what the virtualized host can deliver at all
  (measured ~0.9 at 8->32); Spark jobs cannot exceed it.
- jobs are separate JVMs (subprocess per run), input is a fixed
  pre-derived edge parquet written once before any measurement.

Usage: python scripts/bench_scaling.py [--reps 3] [--edges PATH]
Writes BENCH_SCALING.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_control(procs: int, work: int = 12_000_000) -> float:
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [work] * procs * 4)
    return procs * 4 * work / (time.time() - t0)


def run_job(args: list[str], cpus: int, mem: str = "16g") -> dict:
    env = dict(os.environ, SPARK_GRAFT_MEM=mem)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run.py"), *args,
         "--cpus", str(cpus), "--partitions", "64"],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--edges", default="/tmp/crgp_scale/edges")
    ap.add_argument("--transcripts", default="/tmp/crgp_scale/transcripts")
    ap.add_argument("--n-convs", type=int, default=1_000_000)
    args = ap.parse_args()

    # Fixed shared input, created once (not measured here).
    if not os.path.exists(args.transcripts):
        print("== generating shared input", flush=True)
        run_job(["--algo", "generate", "--n-convs", str(args.n_convs),
                 "--output", args.transcripts], 32)
    if not os.path.exists(args.edges):
        run_job(["--algo", "derive", "--transcripts", args.transcripts,
                 "--output", args.edges], 32)

    jobs = {
        "pagerank_df_20it": ["--algo", "pagerank_df", "--edges", args.edges,
                             "--fixed-iterations", "20"],
        "derive": ["--algo", "derive", "--transcripts", args.transcripts,
                   "--output", "/tmp/crgp_scale/_edges_rederived"],
        "triangles": ["--algo", "triangles", "--edges", args.edges],
    }
    tp_key = {"pagerank_df_20it": "edges_per_sec", "derive": None,
              "triangles": "edges_per_sec"}

    cells: dict[str, dict[int, list[float]]] = {
        name: {lv: [] for lv in LEVELS} for name in jobs
    }
    raw_runs: dict[str, dict[int, list[dict]]] = {
        name: {lv: [] for lv in LEVELS} for name in jobs
    }
    for rep in range(args.reps):
        for lv in LEVELS:
            for name, jargs in jobs.items():
                print(f"== rep {rep} level {lv} job {name}", flush=True)
                r = run_job(jargs, lv)
                raw_runs[name][lv].append(r)
                if tp_key[name]:
                    cells[name][lv].append(float(r[tp_key[name]]))
                else:  # derive reports edges + total_seconds
                    cells[name][lv].append(r["edges"] / r["total_seconds"])

    # North-metric runs: CSR PageRank to convergence (scaled 1e-6), once
    # per level and per layout (delta checkpoints + lineage on,
    # checkpoint every 5). The cascade layout (operators/cascade.py) is
    # the engine's primary path for conversation-derived graphs.
    converged: dict[int, dict] = {}
    converged_cascade: dict[int, dict] = {}
    for lv in LEVELS:
        print(f"== converged CSR pagerank at level {lv}", flush=True)
        converged[lv] = run_job(
            ["--algo", "pagerank", "--edges", args.edges, "--tol-mode",
             "scaled", "--max-iterations", "120", "--checkpoint-every", "5",
             "--checkpoint", f"/tmp/crgp_scale_ckpt_{lv}"], lv)
        print(f"== converged cascade pagerank at level {lv}", flush=True)
        converged_cascade[lv] = run_job(
            ["--algo", "pagerank_cascade", "--edges", args.edges,
             "--tol-mode", "scaled", "--max-iterations", "120",
             "--checkpoint-every", "5",
             "--checkpoint", f"/tmp/crgp_scale_casc_{lv}"], lv)

    cpu = {lv: max(cpu_control(lv) for _ in range(args.reps)) for lv in LEVELS}

    def eff(lo: float, hi: float) -> float:
        return round(hi / lo / (LEVELS[1] / LEVELS[0]), 4)

    best = {
        name: {lv: max(v) for lv, v in per.items()} for name, per in cells.items()
    }
    report = {
        "protocol": "alternating reps, max-throughput per cell, separate JVMs, fixed shared input",
        "reps": args.reps,
        "input_edges": run_job(["--algo", "triangles", "--edges", args.edges], 8)["edges"]
        if False else raw_runs["pagerank_df_20it"][8][0]["edges"],
        "throughput": best,
        "efficiency": {name: eff(b[8], b[32]) for name, b in best.items()},
        "pagerank_converged": {str(lv): converged[lv] for lv in LEVELS},
        "pagerank_converged_efficiency": eff(
            converged[8]["edges_per_sec"], converged[32]["edges_per_sec"]
        ),
        "pagerank_cascade_converged": {
            str(lv): converged_cascade[lv] for lv in LEVELS
        },
        "pagerank_cascade_efficiency": eff(
            converged_cascade[8]["edges_per_sec"],
            converged_cascade[32]["edges_per_sec"],
        ),
        "raw_cpu_control_ops_per_sec": cpu,
        "raw_cpu_control_efficiency": eff(cpu[8], cpu[32]),
        "raw_runs": raw_runs,
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")
    print(json.dumps({k: report[k] for k in
                      ("efficiency", "pagerank_converged_efficiency",
                       "raw_cpu_control_efficiency")}))


if __name__ == "__main__":
    main()
