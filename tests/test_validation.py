"""CLI validator parity with the reference's test matrix
(``src/validation.rs:27-73``)."""

from __future__ import annotations

import argparse

import pytest

from crgp_spark.validation import nonneg_int, positive_int


@pytest.mark.parametrize("bad", ["", "a", "-1"])
def test_nonneg_int_rejects(bad):
    with pytest.raises(argparse.ArgumentTypeError, match="must be an integer"):
        nonneg_int(bad)


@pytest.mark.parametrize("good,expected", [("0", 0), ("1", 1)])
def test_nonneg_int_accepts(good, expected):
    assert nonneg_int(good) == expected


@pytest.mark.parametrize("bad", ["", "a", "-1", "0"])
def test_positive_int_rejects(bad):
    with pytest.raises(
        argparse.ArgumentTypeError, match="must be a positive integer"
    ):
        positive_int(bad)


def test_positive_int_accepts():
    assert positive_int("1") == 1


def test_cli_rejects_bad_partitions():
    """The validators are wired into the job CLI: a bad value fails at
    parse time, not inside a Spark job."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--algo", "pagerank",
         "--partitions", "0"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2
    assert "must be a positive integer" in r.stderr
