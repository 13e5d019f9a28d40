"""Beyond-reference pipeline operators for large-scale training data.

The reference (a 2015 HiveQL lineage tool) has none of these; they are
the operators a 100 TB LLM-data pipeline needs, each expressed with
JVM-side built-in functions (higher-order array functions, xxhash64,
bit ops) wherever possible — Python/Pandas UDFs appear only in the
multimodal decode path where imperative byte handling is the point.
"""

from hadoop__spark.operators import (
    corpus,
    dedup,
    ingest,
    multimodal,
    similarity,
    skew,
    temporal,
    text,
)
from hadoop__spark.operators.util import ensure_parallelism, global_running_sum

__all__ = [
    "corpus",
    "dedup",
    "ensure_parallelism",
    "ingest",
    "global_running_sum",
    "multimodal",
    "similarity",
    "skew",
    "temporal",
    "text",
]
