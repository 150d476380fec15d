"""Run statistics — field-for-field analog of the reference's
``Statistics`` record (``crgp-lib/src/statistics.rs:17-53``): phase
stopwatch laps in nanoseconds, counts, and the derived
``retweet_processing_rate`` (integer math, ``statistics.rs:125-131``).

The reference's CLI serializes this to a TOML file
(``src/main.rs:310-333``); we emit the same structure as JSON (and an
optional minimal TOML writer for byte-level parity of the format) plus
the engine-side extensions: per-superstep lineage totals and scaling
metadata. Phase names map 1:1:

| reference field | ours | meaning here |
|---|---|---|
| time_to_setup | time_to_setup | SparkSession build |
| time_to_process_social_graph | time_to_pack_graph | derivation + CSR pack |
| time_to_load_retweets | time_to_load_input | input scan/count |
| time_to_process_retweets | time_to_process | superstep loop / main job |
| retweet_processing_rate | processing_rate | rows (or edge·iters) per sec |
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class Statistics:
    number_of_friendships: int = 0  # edges in the derived graph
    number_of_retweets: int = 0  # input rows processed (turns/events)
    # graph-load counts (reference: tar.rs:93-96 returned through
    # run.rs:74; logged + folded into friendships_in_social_graph)
    number_of_users: int = 0
    number_of_given_friendships: int = 0
    number_of_expected_friendships: int = 0
    number_of_dummy_users: int = 0
    time_to_setup: int = 0  # ns
    time_to_pack_graph: int = 0  # ns
    time_to_load_input: int = 0  # ns
    time_to_process: int = 0  # ns
    total_time: int = 0  # ns
    processing_rate: int = 0  # rows/s, integer math like the reference
    configuration: dict = field(default_factory=dict)

    def finish(self) -> "Statistics":
        """Derive the rate exactly like ``statistics.rs:125-131``:
        integer division, 0 when the processing time is 0."""
        self.processing_rate = (
            0
            if self.time_to_process == 0
            else (self.number_of_retweets * 1_000_000_000) // self.time_to_process
        )
        self.total_time = (
            self.time_to_setup
            + self.time_to_pack_graph
            + self.time_to_load_input
            + self.time_to_process
        )
        return self

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    def to_toml(self) -> str:
        """Minimal TOML rendering (the reference's stats format,
        ``main.rs:310-333``): scalar keys then a [configuration] table."""
        lines = []
        for k, v in sorted(self.__dict__.items()):
            if k == "configuration":
                continue
            lines.append(f"{k} = {v}")
        lines.append("")
        lines.append("[configuration]")
        for k, v in sorted(self.configuration.items()):
            if isinstance(v, str):
                lines.append(f'{k} = "{v}"')
            elif isinstance(v, bool):
                lines.append(f"{k} = {str(v).lower()}")
            else:
                lines.append(f"{k} = {v}")
        return "\n".join(lines) + "\n"


class Stopwatch:
    """Phase stopwatch mirroring the reference's per-phase laps
    (``reconstruction/run.rs:141-149``)."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter_ns()

    def lap(self) -> int:
        now = time.perf_counter_ns()
        ns = now - self._t0
        self._t0 = now
        return ns
