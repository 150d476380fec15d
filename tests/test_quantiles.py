"""Exact grouped percentiles == numpy's linear-interpolation quantiles."""

from __future__ import annotations

import numpy as np
import pytest


def test_value_quantiles_exact(spark):
    from crgp_spark.operators.quantiles import value_quantiles

    rng = np.random.default_rng(5)
    rows = [
        ("a" if i % 3 else "b", float(v))
        for i, v in enumerate(rng.normal(50, 20, size=501))
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r["event_type"]: r for r in value_quantiles(df).collect()}
    for key in ("a", "b"):
        vals = np.array([v for k, v in rows if k == key])
        assert got[key]["n"] == len(vals)
        for p, col in [(25, "p25"), (50, "p50"), (75, "p75"), (90, "p90"), (99, "p99")]:
            # same linear-interpolation definition; numpy orders the fp
            # ops differently, so allow ulp-level slack (the BIT-exact
            # cross-engine check is the Spark-vs-DuckDB driver gate)
            assert got[key][col] == pytest.approx(
                np.percentile(vals, p, method="linear"), rel=1e-12
            )


def test_value_quantiles_single_row_group(spark):
    df = spark.createDataFrame([("x", 7.5)], "event_type string, value double")
    r = value_quantiles_row(spark, df)
    assert r["n"] == 1 and r["p25"] == r["p99"] == 7.5


def value_quantiles_row(spark, df):
    from crgp_spark.operators.quantiles import value_quantiles

    return value_quantiles(df).collect()[0]


def test_approx_contract_holds(spark):
    """approx_percentile must sit inside its documented rank-error band
    even at coarse accuracy (eps = 1/20 = 5%), including duplicate-heavy
    and NULL-bearing groups."""
    import numpy as np

    from crgp_spark.operators.quantiles import value_quantiles_approx

    rng = np.random.default_rng(5)
    rows = [("a", float(v)) for v in rng.normal(0, 100, 4000)]
    rows += [("dups", float(v)) for v in rng.integers(0, 3, 2000)]
    rows += [("withnull", None)] * 50
    rows += [("withnull", float(v)) for v in rng.random(500)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = value_quantiles_approx(df, accuracy=20).collect()
    assert len(out) == 3 * 5
    assert all(r.within_bound for r in out)
    ns = {r.event_type: r.n for r in out}
    assert ns == {"a": 4000, "dups": 2000, "withnull": 500}


def test_approx_contract_all_null_group_vacuous(spark):
    from crgp_spark.operators.quantiles import value_quantiles_approx

    df = spark.createDataFrame(
        [("empty", None), ("empty", None)], "event_type string, value double"
    )
    out = value_quantiles_approx(df).collect()
    assert len(out) == 5
    assert all(r.n == 0 and r.within_bound for r in out)
