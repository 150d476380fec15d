"""stream_anomalies: buffer-pruned keyed state == independent
brute-force trailing-window z-test, expiry semantics across
micro-batches, strict-order contract enforcement."""

from __future__ import annotations

import random

import pytest

from crgp_spark.streaming.anomaly import stream_anomalies
from crgp_spark.streaming.scd import write_time_chunks

W = 1_000  # window_us for the synthetic feeds
Z, MIN_N = 2, 4


def _brute(rows):
    """rows = [(key, us, event_id, cents)] -> flagged
    (event_id, key, us, cents, n_window) via the batch RANGE-frame
    definition, pure Python integers (no overflow, no floats)."""
    out = []
    for key, us, eid, x in rows:
        win = [c for k, u, _, c in rows if k == key and us - W <= u <= us]
        n, s, ss = len(win), sum(win), sum(c * c for c in win)
        if n >= MIN_N and (x * n - s) ** 2 > Z * Z * (n * ss - s * s):
            out.append((eid, key, us, x, n))
    return sorted(out)


def _feed(n_keys=3, n_rows=150, seed=13):
    rng = random.Random(seed)
    rows, us = [], {k: 0 for k in range(n_keys)}
    gaps = [37, 61, 90, 90, 90, 90, 90, 3 * W]
    vals = [10, 11, 12, 9] * 5 + [300, -250]
    for i in range(n_rows):
        k = rng.randrange(n_keys)
        # mostly dense ticks, occasionally a gap far past the window
        us[k] += rng.choice(gaps)
        rows.append((k, us[k], i, rng.choice(vals)))
    return rows


@pytest.fixture(scope="module")
def flagged(spark, tmp_path_factory):
    rows = _feed()
    work = str(tmp_path_factory.mktemp("anom_stream"))
    df = spark.createDataFrame(
        rows, "key: long, us: long, event_id: long, cents: long"
    )
    write_time_chunks(df, work, n_chunks=4)
    got = stream_anomalies(spark, work, window_us=W, z=Z, min_n=MIN_N)
    return rows, sorted(map(tuple, got.collect()))


def test_stream_equals_bruteforce(flagged):
    rows, got = flagged
    want = _brute(rows)
    assert got == want
    assert len(want) >= 5  # the feed actually exercises the flag


def test_windows_expire(flagged):
    """A row right after a 3·W gap must never flag — its window holds
    only itself (n=1 < min_n), however wild the value — proving old
    state stops contributing once outside the window."""
    rows, got = flagged
    flagged_ids = {eid for eid, *_ in got}
    by_key: dict[int, int] = {}
    post_gap = set()
    for k, us, eid, _ in rows:
        if k in by_key and us - by_key[k] > W:
            post_gap.add(eid)
        by_key[k] = us
    assert post_gap and not (post_gap & flagged_ids)


def test_equal_time_ties_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 100, 0, 5), (1, 100, 1, 6), (1, 200, 2, 7)],
        "key: long, us: long, event_id: long, cents: long",
    )
    work = str(tmp_path / "ties")
    write_time_chunks(df, work, n_chunks=1)
    with pytest.raises(Exception, match="strictly increase"):
        stream_anomalies(spark, work, window_us=W, z=Z, min_n=2)


def test_overflow_envelope_raises(spark, tmp_path):
    big = 2_100_000_000
    df = spark.createDataFrame(
        [(1, 100 * i, i, big + i) for i in range(4)],
        "key: long, us: long, event_id: long, cents: long",
    )
    work = str(tmp_path / "ovf")
    write_time_chunks(df, work, n_chunks=1)
    with pytest.raises(Exception, match="overflow envelope"):
        stream_anomalies(spark, work, window_us=W, z=Z, min_n=2)
