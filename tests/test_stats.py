"""Statistics parity with the reference's rate computation
(``statistics.rs:125-131``) incl. its quickcheck property
(``statistics.rs:344-366``): integer and float rates agree within 1."""

from __future__ import annotations

from hypothesis import given, strategies as st

from crgp_spark.stats import Statistics


@given(
    rows=st.integers(min_value=0, max_value=10**9),
    ns=st.integers(min_value=0, max_value=10**15),
)
def test_integer_rate_matches_float_within_one(rows, ns):
    from fractions import Fraction

    s = Statistics(number_of_retweets=rows, time_to_process=ns).finish()
    if ns == 0:
        assert s.processing_rate == 0
    else:
        # exact rational comparison: float64 loses >1 ulp when
        # rows*1e9 exceeds 2^53, so the float formulation of the
        # reference's quickcheck property is itself imprecise there
        assert abs(s.processing_rate - Fraction(rows * 10**9, ns)) < 1


def test_total_time_is_phase_sum_and_toml_shape():
    s = Statistics(
        number_of_retweets=100,
        time_to_setup=1,
        time_to_pack_graph=2,
        time_to_load_input=3,
        time_to_process=4,
        configuration={"algorithm": "pagerank", "scaled": True},
    ).finish()
    assert s.total_time == 10
    toml = s.to_toml()
    assert "processing_rate = 25000000000" in toml
    assert "[configuration]" in toml
    assert 'algorithm = "pagerank"' in toml
    assert "scaled = true" in toml
