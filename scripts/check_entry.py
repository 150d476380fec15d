"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB at the given sf dir, compare row count, column names and
order-insensitive values. Usage::

    python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from crgp_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def compare(name, sdf, con, sql) -> list[str]:
    errs = []
    spark_rows = sdf.collect()
    scols = sdf.columns
    try:
        res = con.sql(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as exc:  # noqa: BLE001
        return [f"{name}: oracle SQL failed: {exc}"]
    if sorted(scols) != sorted(ocols):
        errs.append(f"{name}: columns spark={scols} oracle={ocols}")
        return errs
    if len(spark_rows) != len(orows):
        errs.append(f"{name}: rows spark={len(spark_rows)} oracle={len(orows)}")
    idx = [ocols.index(c) for c in sorted(scols)]
    sset = sorted(
        tuple(_norm(r[c]) for c in sorted(scols)) for r in spark_rows
    )
    oset = sorted(tuple(_norm(r[i]) for i in idx) for r in orows)
    if sset != oset:
        diff_s = [r for r in sset if r not in oset][:3]
        diff_o = [r for r in oset if r not in sset][:3]
        errs.append(f"{name}: VALUES differ; spark-only={diff_s} oracle-only={diff_o}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_entry", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                errs = compare(name, sdf, con, oracles[name])
            else:
                n = sdf.count()
                errs = [] if n >= 0 else [f"{name}: no rows"]
        except Exception as exc:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            errs = [f"{name}: spark failed: {exc}"]
        status = "OK " if not errs else "FAIL"
        print(f"[{status}] {name:20s} {time.time() - t0:6.1f}s")
        failures.extend(errs)

    # smoke-check entry()
    t0 = time.time()
    n = entrymod.entry(spark).count()
    print(f"[OK ] entry() rows={n} {time.time() - t0:6.1f}s")

    for e in failures:
        print("  " + e)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
