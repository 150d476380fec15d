"""Command-line argument validators — parity with the reference CLI's
validator collection (``src/validation.rs:11-25``: ``usize`` and
``positive_usize``), shaped as argparse ``type=`` callables so invalid
values fail at parse time with the reference's error wording instead of
deep inside a Spark job.
"""

from __future__ import annotations

import argparse


def nonneg_int(value: str) -> int:
    """``validation.rs::usize``: any non-negative integer ('' / 'a' /
    '-1' rejected, '0' accepted)."""
    try:
        v = int(value)
    except ValueError:
        v = -1
    if v < 0:
        raise argparse.ArgumentTypeError("The value must be an integer.")
    return v


def positive_int(value: str) -> int:
    """``validation.rs::positive_usize``: an integer strictly greater
    than 0."""
    try:
        v = int(value)
    except ValueError:
        v = 0
    if v <= 0:
        raise argparse.ArgumentTypeError(
            "The value must be a positive integer."
        )
    return v
