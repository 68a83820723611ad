from datafusion_uba_spark.operators.retention import (
    flags_to_stats,
    retention,
    retention_count,
    retention_sum,
)

__all__ = ["flags_to_stats", "retention", "retention_count", "retention_sum"]
