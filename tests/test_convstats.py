"""conversation_profile: hand-computed fixture + single-shuffle plan."""

import datetime as dt

from crgp_spark.operators.convstats import conversation_profile


def _turns(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # conv a: user, assistant, user — 2 switches, 90 s span
        ("a", 0, "user", "hi", None, t0),
        ("a", 1, "assistant", "hello!", None, t0 + dt.timedelta(seconds=30)),
        ("a", 2, "user", "bye", None, t0 + dt.timedelta(seconds=90)),
        # conv b: single turn — 0 switches, 0 span
        ("b", 0, "user", "solo", None, t0),
        # conv c: same role twice then a switch
        ("c", 0, "user", "x", None, t0),
        ("c", 1, "user", "yy", None, t0 + dt.timedelta(seconds=5)),
        ("c", 2, "tool", "zzzz", None, t0 + dt.timedelta(seconds=6)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_profile_values(spark):
    got = {
        r["conv_id"]: r.asDict()
        for r in conversation_profile(_turns(spark)).collect()
    }
    a = got["a"]
    assert a["n_turns"] == 3 and a["n_roles"] == 2
    assert a["total_chars"] == 2 + 6 + 3 and a["max_turn_chars"] == 6
    assert a["first_role"] == "user" and a["last_role"] == "user"
    assert a["n_switches"] == 2
    assert a["duration_us"] == 90_000_000

    b = got["b"]
    assert b["n_turns"] == 1 and b["n_switches"] == 0 and b["duration_us"] == 0

    c = got["c"]
    assert c["n_switches"] == 1 and c["last_role"] == "tool"


def test_single_exchange_plan(spark):
    """The LAG window and the groupBy share the conv_id hash partitioning:
    exactly one shuffle in the physical plan."""
    plan = (
        conversation_profile(_turns(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
