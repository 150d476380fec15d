"""kfold_assign (sample.py), kendall_tau (regress.py), heaps_fit
(textstats.py), stream_benford (streaming/windows.py) vs mirrors."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pyspark.sql import functions as F

from crgp_spark.operators.regress import kendall_tau
from crgp_spark.operators.sample import kfold_assign
from crgp_spark.operators.textstats import heaps_fit


def _u32(v):
    # _md5_u32 over the BINARY cast of a Spark string column
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def test_kfold_mirror(spark):
    rows = [(u, "purchase" if u % 3 == 0 else "view")
            for u in range(60) for _ in range(1 + u % 2)]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    got = {
        r.fold: (r.n_rows, r.n_keys, r.n_pos)
        for r in kfold_assign(
            df, "user_id", k=4,
            label_expr=(F.col("event_type") == "purchase").cast("int"),
        ).collect()
    }
    ref = {}
    for u, et in rows:
        f = _u32(u) % 4
        n, keys, pos = ref.get(f, (0, set(), 0))
        ref[f] = (n + 1, keys | {u}, pos + (et == "purchase"))
    assert got == {f: (n, len(k), p) for f, (n, k, p) in ref.items()}
    # group-safety: all rows of a key in one fold (by construction of hash)


def _tau_ref(xy):
    n = len(xy)
    nc = nd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xy[j][0] > xy[i][0]) - (xy[j][0] < xy[i][0])
            dy = (xy[j][1] > xy[i][1]) - (xy[j][1] < xy[i][1])
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    n0 = n * (n - 1) // 2
    denx, deny = n0 - tx, n0 - ty
    tau = (
        (nc - nd) / math.sqrt(float(denx) * float(deny))
        if denx > 0 and deny > 0
        else 0.0
    )
    return n, nc, nd, tx, ty, math.floor(tau * 1e6 + 0.5) / 1e6


def test_kendall_tau_mirror(spark):
    xy = [((i * 5) % 7, ((i * 3) % 5) + (i // 10)) for i in range(30)]
    df = spark.createDataFrame(
        [(t, x, y) for t, (x, y) in enumerate(xy)],
        "t: long, x: long, y: long",
    )
    r = kendall_tau(df).collect()[0]
    assert tuple(r) == _tau_ref(xy)


def test_kendall_tau_perfect(spark):
    df = spark.createDataFrame(
        [(i, i, 2 * i + 1) for i in range(12)], "t: long, x: long, y: long"
    )
    r = kendall_tau(df).collect()[0]
    assert r.tau == 1.0 and r.nd == 0


def _lnq(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def test_heaps_mirror(spark):
    texts = [
        " ".join(f"w{(i * k) % (3 + i)}" for k in range(4 + 3 * i))
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    pts = []
    for t in texts:
        toks = re.sub(r"[^a-z0-9]+", " ", t.lower()).split()
        if toks:
            pts.append((_lnq(len(toks)), _lnq(len(set(toks)))))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    beta = float(n * sxy - sx * sy) / float(den) if den else 0.0
    logk = (float(sy) - beta * float(sx)) / float(n)
    r = heaps_fit(df).collect()[0]
    assert r.n_docs == n
    assert r.beta == math.floor(beta * 1e6 + 0.5) / 1e6
    assert r.logk_unats == math.floor(logk * 100 + 0.5) / 100
    assert 0.0 < r.beta <= 1.05  # vocabulary growth exponent sanity


def test_stream_benford_equals_batch(spark, tmp_path):
    from crgp_spark.operators.gini import benford_audit
    from crgp_spark.streaming.windows import stream_benford

    rows = [(i, float(int(math.exp(i / 9.0) * 7 + 1)) / 100) for i in range(120)]
    df = spark.createDataFrame(rows, "event_id: long, value: double")
    work = str(tmp_path / "ev")
    df.repartition(6, "event_id").write.parquet(work)
    got = stream_benford(spark, work, max_files_per_trigger=1).collect()
    cents = spark.read.parquet(work).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x")
    )
    want = benford_audit(cents).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
