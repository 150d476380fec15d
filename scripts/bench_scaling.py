"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real multi-node cluster exists in this sandbox, so per the driver
instruction the N -> 4N executor criterion is evidenced by running the
SAME job on the SAME input at two local parallelism levels (local[8]
vs local[32], separate JVMs via subprocess), reporting throughput at
both plus scaling efficiency::

    eff = (edges_per_sec @ 32 cores) / (edges_per_sec @ 8 cores) / 4

Writes BENCH_SCALING.json at the repo root and refreshes the measured
table in BASELINE.md.

Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = "derive_edges,pack_csr,pagerank_converged,pagerank_df_10it"


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CKPT=f"/tmp/crgp_scaling_ckpt_{cpus}",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--queries", QUERIES],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    levels = {}
    for cpus in (8, 32):
        print(f"== running bench at local[{cpus}] on {sf_dir}", flush=True)
        levels[cpus] = run_level(cpus, sf_dir)
        print(json.dumps(levels[cpus]), flush=True)

    def eff(metric: str) -> float | None:
        lo, hi = levels[8].get(metric), levels[32].get(metric)
        if not lo or not hi:
            return None
        return round(hi / lo / (32 / 8), 4)

    report = {
        "sf_dir": sf_dir,
        "input_identical": True,
        "levels": {str(k): v for k, v in levels.items()},
        "scaling_efficiency": {
            "edges_per_sec_pagerank": eff("edges_per_sec_pagerank"),
            "edges_per_sec_pagerank_df": eff("edges_per_sec_pagerank_df"),
            "derive_edges_per_sec": eff("derive_edges_per_sec"),
        },
        "criterion": "throughput scaling efficiency >= 0.8 from N to 4N parallelism",
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")
    print(json.dumps(report["scaling_efficiency"]))


if __name__ == "__main__":
    main()
