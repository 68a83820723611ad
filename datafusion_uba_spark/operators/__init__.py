from datafusion_uba_spark.operators.retention import (
    retention,
    retention_count,
    retention_sum,
)

__all__ = ["retention", "retention_count", "retention_sum"]
