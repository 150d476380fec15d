"""Two-cluster-size scaling evidence under SEPARATE EXECUTOR JVMs.

VERDICT r1 accepted the shared-JVM (`local[N]`) scaling argument but
asked for the strongest evidence this machine can produce: the same
sweep under ``local-cluster[E,C,MEM]`` — Spark's test-cluster master
that launches E real executor JVMs with C cores and MEM MiB each, with
real serialization, real netty shuffle, and per-executor heaps. This
isolates the shared-JVM term (GC + allocator + JIT contention) from the
two terms that genuinely do not amortize on one box: shared memory
bandwidth and the fixed per-job/per-superstep driver latency.

Levels: 2 executors x 4 cores  (N  = 8 cores)
        8 executors x 4 cores  (4N = 32 cores)

Protocol identical to scripts/bench_scaling.py (alternating reps,
max-throughput per cell, separate driver JVM per run, fixed shared
input, raw-CPU control). Writes BENCH_SCALING_CLUSTER.json.

Usage: python scripts/bench_scaling_cluster.py [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_scaling import cpu_control  # noqa: E402

#: (label, --master value, total cores)
LEVELS = (
    ("2x4", "local-cluster[2,4,10240]", 8),
    ("8x4", "local-cluster[8,4,10240]", 32),
)


def run_job(args: list[str], master: str, mem: str = "12g") -> dict:
    env = dict(os.environ, SPARK_GRAFT_MEM=mem)
    last_err = None
    for attempt in range(2):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run.py"), *args,
             "--master", master, "--partitions", "64",
             # local-cluster[E,C,MEM]'s MEM is the WORKER's capacity;
             # executors default to 1g unless spark.executor.memory is
             # set — without this every executor runs at -Xmx1024M.
             "--executor-memory", "9g"],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode == 0:
            return json.loads(
                [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            )
        last_err = out.stderr[-4000:]
        print(f"!! attempt {attempt} failed rc={out.returncode}\n{last_err}",
              flush=True)
    raise RuntimeError(f"job failed twice: {args}\n{last_err}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--edges", default="/tmp/crgp_scale/edges")
    ap.add_argument("--transcripts", default="/tmp/crgp_scale/transcripts")
    ap.add_argument("--jobs", default="", help="comma-separated subset of "
                    "throughput jobs (default all)")
    ap.add_argument("--skip-converged", action="store_true")
    ap.add_argument("--out", default="BENCH_SCALING_CLUSTER.json")
    ap.add_argument("--scratch", default="/tmp", help="dir for checkpoints "
                    "and derived outputs; point at /dev/shm (with "
                    "SPARK_LOCAL_DIRS also on tmpfs and --edges/--transcripts "
                    "copied there) to take the single shared spindle out of "
                    "the measurement — the disk-vs-plan discriminator sweep")
    args = ap.parse_args()
    assert os.path.exists(args.edges), "run scripts/bench_scaling.py first"

    jobs = {
        "pagerank_df_20it": ["--algo", "pagerank_df", "--edges", args.edges,
                             "--fixed-iterations", "20"],
        "derive": ["--algo", "derive", "--transcripts", args.transcripts,
                   "--output", f"{args.scratch}/crgp_scale_edges_cluster"],
        "triangles": ["--algo", "triangles", "--edges", args.edges],
    }
    if args.jobs:
        keep = {j for j in args.jobs.split(",") if j}
        jobs = {k: v for k, v in jobs.items() if k in keep}
    tp_key = {"pagerank_df_20it": "edges_per_sec", "derive": None,
              "triangles": "edges_per_sec"}

    cells = {name: {lbl: [] for lbl, _, _ in LEVELS} for name in jobs}
    raw_runs = {name: {lbl: [] for lbl, _, _ in LEVELS} for name in jobs}
    for rep in range(args.reps):
        for lbl, master, _cores in LEVELS:
            for name, jargs in jobs.items():
                print(f"== rep {rep} level {lbl} job {name}", flush=True)
                t0 = time.time()
                r = run_job(jargs, master)
                print(f"   {time.time() - t0:.0f}s {r}", flush=True)
                raw_runs[name][lbl].append(r)
                tp = (float(r[tp_key[name]]) if tp_key[name]
                      else r["edges"] / r["total_seconds"])
                cells[name][lbl].append(tp)

    converged: dict[str, dict] = {}
    converged_cascade: dict[str, dict] = {}
    for lbl, master, _cores in ([] if args.skip_converged else LEVELS):
        print(f"== converged CSR pagerank at {lbl}", flush=True)
        converged[lbl] = run_job(
            ["--algo", "pagerank", "--edges", args.edges, "--tol-mode",
             "scaled", "--max-iterations", "120", "--checkpoint-every", "5",
             "--checkpoint", f"{args.scratch}/crgp_lc_ckpt_{lbl}"], master)
        print(f"   {converged[lbl]}", flush=True)
        print(f"== converged cascade pagerank at {lbl}", flush=True)
        converged_cascade[lbl] = run_job(
            ["--algo", "pagerank_cascade", "--edges", args.edges,
             "--tol-mode", "scaled", "--max-iterations", "120",
             "--checkpoint-every", "5",
             "--checkpoint", f"{args.scratch}/crgp_lc_casc_{lbl}"], master)
        print(f"   {converged_cascade[lbl]}", flush=True)

    cpu = {lbl: max(cpu_control(cores) for _ in range(args.reps))
           for lbl, _, cores in LEVELS}

    lo, hi = LEVELS[0][0], LEVELS[1][0]

    def eff(a: float, b: float) -> float:
        return round(b / a / 4.0, 4)

    best = {name: {lbl: max(v) for lbl, v in per.items()}
            for name, per in cells.items()}
    report = {
        "protocol": "local-cluster separate executor JVMs (E x 4 cores x 10g); "
        "alternating reps, max-throughput per cell, separate driver JVM per "
        "run, fixed shared input (same as BENCH_SCALING.json)",
        "reps": args.reps,
        "input_edges": next(iter(raw_runs.values()))[lo][0]["edges"]
        if jobs else None,
        "throughput": best,
        "efficiency": {name: eff(b[lo], b[hi]) for name, b in best.items()},
        "pagerank_converged": converged,
        "pagerank_converged_efficiency": eff(
            converged[lo]["edges_per_sec"], converged[hi]["edges_per_sec"])
        if converged else None,
        "pagerank_cascade_converged": converged_cascade,
        "pagerank_cascade_efficiency": eff(
            converged_cascade[lo]["edges_per_sec"],
            converged_cascade[hi]["edges_per_sec"]) if converged_cascade else None,
        "raw_cpu_control_ops_per_sec": cpu,
        "raw_cpu_control_efficiency": eff(cpu[lo], cpu[hi]),
        "raw_runs": raw_runs,
    }
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")
    print(json.dumps({k: report.get(k) for k in
                      ("efficiency", "pagerank_converged_efficiency",
                       "pagerank_cascade_efficiency",
                       "raw_cpu_control_efficiency")}))


if __name__ == "__main__":
    main()
