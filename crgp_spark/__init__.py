"""crgp_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference system BMeu/CRGP (a Rust /
timely-dataflow retweet-cascade influence reconstructor) as idiomatic
PySpark: declarative DataFrame pipelines optimized by Catalyst/AQE, with
vectorized Arrow kernels only where built-in operators cannot express the
semantics (CSR gather-scatter), and a driver-side superstep harness with
delta checkpoints, per-partition lineage and resume for iterative graph
algorithms (PageRank, connected components, label propagation, triangle
counting).

Input model (BASELINE.json input_hint): a table of multi-turn transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``; each conversation is a cascade, the opening turn's
participant is the originator, and influence edges are derived under the
stable ordering key ``(conv_id, turn_idx)`` with the reference's exact
activation rule (strictly-earlier first activation, originator always
eligible — reference ``crgp-lib/src/timely_extensions/operators/
reconstruct.rs:59-113``).
"""

from crgp_spark.config import EngineConfig
from crgp_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
