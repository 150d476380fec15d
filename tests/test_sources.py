"""Source/sink parity against the reference's OWN fixture files
(`/root/reference/data/`, read-only) — the same inputs its 10
integration tests use (``crgp-lib/tests/algorithm_execution.rs``).
"""

from __future__ import annotations

import os

import pytest

from crgp_spark.derive import derive_edges_from_retweets
from crgp_spark.golden import GOLDEN_EDGES, GOLDEN_GRAPH, GOLDEN_RETWEETS
from crgp_spark.sources.retweets import load_retweets
from crgp_spark.sources.sink import cascade_lines, write_cascades_csv
from crgp_spark.sources.social_graph import load_selected_users, load_social_graph

DATA = "/root/reference/data"
GRAPH_DIR = os.path.join(DATA, "social_graph")
RT_FILE = os.path.join(DATA, "retweets.json")
VIP_FILE = os.path.join(DATA, "retweeting_users.txt")

GOLDEN_PAIRS = {(u, f) for u, fs in GOLDEN_GRAPH.items() for f in fs}


@pytest.fixture(scope="module")
def graph_available():
    if not os.path.isdir(GRAPH_DIR):
        pytest.skip("reference fixture not present")


def test_tar_scan_matches_reference_fixture(spark, graph_available):
    got = {
        (r["user"], r["friend"])
        for r in load_social_graph(spark, GRAPH_DIR).collect()
    }
    # friendless users (1005, 1006, 10001001) dropped; friendsa.csv and
    # invalid.tar members skipped by name validation (tar.rs:32-53).
    assert got == GOLDEN_PAIRS


def test_tar_scan_dummy_padding(spark, graph_available):
    got = {
        (r["user"], r["friend"])
        for r in load_social_graph(
            spark, GRAPH_DIR, pad_with_dummy_users=True
        ).collect()
    }
    # dummies fill the gap between metadata-expected and parsed counts
    # with per-user ids -1..-missing (tar.rs:344-352): u0 expects 3 has
    # 2, u2 expects 42 has 1, u1006 expects 1 has 0; users expecting 0
    # (1005, 10001001) stay friendless and dropped.
    expected = (
        GOLDEN_PAIRS
        | {(0, -1), (1006, -1)}
        | {(2, -d) for d in range(1, 42)}
    )
    assert got == expected


def test_tar_scan_selected_users(spark, graph_available):
    vips = load_selected_users(spark, VIP_FILE)
    assert {r["user"] for r in vips.collect()} == {0, 1, 2, 3}
    got = {
        (r["user"], r["friend"])
        for r in load_social_graph(spark, GRAPH_DIR, selected_users=vips).collect()
    }
    assert got == {(u, f) for (u, f) in GOLDEN_PAIRS if u != 4}


def test_jsonl_retweet_scan(spark, graph_available):
    rts = load_retweets(spark, RT_FILE)
    got = {
        (
            r["cascade_id"],
            r["rt_id"],
            r["rt_user"],
            r["rt_ts"],
            r["orig_user"],
            r["orig_ts"],
        )
        for r in rts.collect()
    }
    assert got == set(GOLDEN_RETWEETS)  # original tweets discarded


@pytest.mark.parametrize("selected", [False, True])
def test_end_to_end_reference_pipeline(spark, graph_available, selected, tmp_path):
    """Files -> our sources -> derivation == the reference's golden 7
    lines (algorithm_execution.rs:58-66), incl. the cascs.csv format."""
    vips = load_selected_users(spark, VIP_FILE) if selected else None
    graph = load_social_graph(spark, GRAPH_DIR, selected_users=vips)
    rts = load_retweets(spark, RT_FILE)
    edges = derive_edges_from_retweets(rts, graph)
    got = {
        (r["cascade_id"], r["retweet_id"], r["influencee"], r["influencer"], r["ts"])
        for r in edges.collect()
    }
    assert got == GOLDEN_EDGES

    lines = {r["value"] for r in cascade_lines(edges).collect()}
    assert lines == {
        "1;3;2;0;1;-1",
        "1;4;1;0;2;-1",
        "1;4;1;2;2;-1",
        "1;6;3;2;3;-1",
        "2;5;0;1;3;-1",
        "2;7;2;0;4;-1",
        "2;8;3;2;5;-1",
    }

    out = str(tmp_path / "cascs")
    write_cascades_csv(edges, out, single_file=True)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 1
    with open(os.path.join(out, files[0])) as f:
        assert {line.strip() for line in f if line.strip()} == lines


def test_s3_config_passthrough(spark, monkeypatch):
    """Reference parity for the S3 input variants (tar.rs:211-342,
    get.rs:80-113): credentials resolve from the same env vars the
    reference uses (aws_s3.rs:9-16) into fs.s3a.* Hadoop conf; explicit
    args win over env; a session token selects the temporary-credentials
    provider. Offline — configuration only."""
    from crgp_spark.sources.cloud import configure_s3

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "env-ak")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "env-sk")
    monkeypatch.setenv("AWS_SESSION_TOKEN", "env-tok")
    applied = configure_s3(
        spark,
        secret_key="explicit-sk",
        extra={"fs.s3a.path.style.access": "true"},
    )
    assert applied["fs.s3a.access.key"] == "env-ak"
    assert applied["fs.s3a.secret.key"] == "explicit-sk"
    assert applied["fs.s3a.session.token"] == "env-tok"
    assert applied["fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.access.key") == "env-ak"
    assert conf.get("fs.s3a.secret.key") == "explicit-sk"
    assert conf.get("fs.s3a.path.style.access") == "true"


def test_sources_accept_scheme_qualified_paths(spark, graph_available):
    """The source readers are scheme-agnostic (Hadoop FileSystem URIs):
    a file:// URI — the in-sandbox stand-in for s3a:// — must load
    identically to a bare path."""
    bare = {
        (r["user"], r["friend"])
        for r in load_social_graph(spark, GRAPH_DIR).collect()
    }
    uri = {
        (r["user"], r["friend"])
        for r in load_social_graph(spark, "file://" + GRAPH_DIR).collect()
    }
    assert bare == uri and bare == GOLDEN_PAIRS
    rt_bare = load_retweets(spark, RT_FILE).count()
    rt_uri = load_retweets(spark, "file://" + RT_FILE).count()
    assert rt_bare == rt_uri and rt_bare > 0


def test_graph_load_counts(spark, graph_available):
    """Statistics-field parity for the graph load (tar.rs:93-96,
    run.rs:74): users kept, given friendships (pre-padding), expected
    friendships, dummies created — pinned to the reference fixture and
    consistent with the exploded edges. Padding rescues the one
    friendless-but-expected user (so 6 vs 5 users kept), and dropped
    users' expected counts are excluded, exactly as in tar.rs:190-202."""
    from crgp_spark.sources.social_graph import load_social_graph_with_stats

    edges, counts = load_social_graph_with_stats(
        spark, GRAPH_DIR, pad_with_dummy_users=True
    )
    assert counts == {
        "number_of_users": 6,
        "number_of_given_friendships": 8,
        "number_of_expected_friendships": 51,
        "number_of_dummy_users": 43,
    }
    rows = edges.collect()
    assert len([r for r in rows if r["friend"] >= 0]) == 8
    assert len([r for r in rows if r["friend"] < 0]) == 43
    assert len({r["user"] for r in rows}) == 6

    _, counts0 = load_social_graph_with_stats(
        spark, GRAPH_DIR, pad_with_dummy_users=False
    )
    assert counts0 == {
        "number_of_users": 5,
        "number_of_given_friendships": 8,
        "number_of_expected_friendships": 50,
        "number_of_dummy_users": 0,
    }
