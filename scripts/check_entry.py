"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB at the given sf dir, compare row count, column names and
order-insensitive values. Usage::

    python scripts/check_entry.py [--json PATH] [sf_dir] [query ...]

``--json`` also records every entry in the driver's CORRECTNESS format
(rows/schema/hash match booleans + row counts) — committed per round as
``CORRECTNESS_FULL_rNN.json`` so the FULL surface has an artifact trail
even though the round driver's own gate only executes the first 50
entries (VERDICT r3 finding #1).
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


def compare(name, sdf, con, sql) -> tuple[list[str], dict]:
    errs = []
    spark_rows = sdf.collect()
    scols = sdf.columns
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": len(spark_rows),
        "oracle_rows": None,
        "err": None,
    }
    try:
        res = con.sql(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as exc:  # noqa: BLE001
        rec["err"] = f"oracle SQL failed: {exc}"
        return [f"{name}: {rec['err']}"], rec
    rec["oracle_rows"] = len(orows)
    rec["rows_match"] = len(spark_rows) == len(orows)
    rec["schema_match"] = sorted(scols) == sorted(ocols)
    if not rec["schema_match"]:
        errs.append(f"{name}: columns spark={scols} oracle={ocols}")
        return errs, rec
    if not rec["rows_match"]:
        errs.append(f"{name}: rows spark={len(spark_rows)} oracle={len(orows)}")
    idx = [ocols.index(c) for c in sorted(scols)]
    sset = sorted(
        tuple(_norm(r[c]) for c in sorted(scols)) for r in spark_rows
    )
    oset = sorted(tuple(_norm(r[i]) for i in idx) for r in orows)
    rec["hash_match"] = sset == oset
    if not rec["hash_match"]:
        diff_s = [r for r in sset if r not in oset][:3]
        diff_o = [r for r in oset if r not in sset][:3]
        errs.append(f"{name}: VALUES differ; spark-only={diff_s} oracle-only={diff_o}")
    return errs, rec


def main():
    import json

    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check_entry", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = None
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                errs, rec = compare(name, sdf, con, oracles[name])
            else:
                n = sdf.count()
                errs = [] if n >= 0 else [f"{name}: no rows"]
                rec = {"rows_only": True, "spark_rows": n, "err": None}
        except Exception as exc:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            errs = [f"{name}: spark failed: {exc}"]
            rec = {"err": f"spark failed: {exc}"}
        rec["seconds"] = round(time.time() - t0, 1)
        records[name] = rec
        status = "OK " if not errs else "FAIL"
        print(f"[{status}] {name:20s} {rec['seconds']:6.1f}s")
        failures.extend(errs)

    if json_path:
        with open(json_path, "w") as f:
            json.dump(records, f, indent=1)

    # smoke-check entry()
    t0 = time.time()
    n = entrymod.entry(spark).count()
    print(f"[OK ] entry() rows={n} {time.time() - t0:6.1f}s")

    for e in failures:
        print("  " + e)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
