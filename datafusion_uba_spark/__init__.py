"""datafusion_uba_spark — a PySpark-native user-behavior-analytics engine.

A brand-new implementation (not a port) of the capabilities of
openuba/datafusion-uba: cohort-retention aggregate operators
(``retention_count`` / ``retention_sum``), the SQL + source surface its
queries exercise, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design stance (see SURVEY.md §7): every hot-path operator is a
composition of built-in Catalyst expressions/aggregates, so partial
aggregation, whole-stage codegen, pushdown, and 100 TB shuffle behavior
come from Spark unchanged. Python UDFs appear only where semantics
genuinely require them (multimodal decode), always Arrow-batched.
"""

from datafusion_uba_spark.session import get_spark
from datafusion_uba_spark.operators.retention import (
    retention,
    retention_count,
    retention_sum,
)
from datafusion_uba_spark.operators import (  # noqa: F401
    audiocodec,
    dedup,
    erasure,
    imagecodec,
    kmeans,
    multimodal,
    packing,
    pagerank,
    quality,
    rollup,
    sampling,
    scd,
    similarity,
    sketches,
    survival,
    text,
)

__all__ = [
    "get_spark",
    "retention",
    "retention_count",
    "retention_sum",
    "dedup",
    "erasure",
    "similarity",
    "text",
    "multimodal",
    "imagecodec",
    "kmeans",
    "packing",
    "quality",
    "rollup",
    "sampling",
    "scd",
    "sketches",
    "audiocodec",
    "pagerank",
    "survival",
]

__version__ = "0.1.0"
