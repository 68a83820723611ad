"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship retention funnel (the reference's
one real query: examples/retention.rs:22-44 / retention.slt:46-56) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2
inventory; implementations live in ``datafusion_uba_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_uba_spark import queries as _q  # noqa: E402
from datafusion_uba_spark.operators.retention import retention_sum  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Two-stage retention funnel: per-user cohort bitmaps folded into the
    triangular retention matrix, exploded to (cohort_day, day_offset,
    retained) rows for a stable flat schema.
    """
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    stats = _q._stats_df(spark, sf_dir)
    matrix = retention_sum(stats, "stats", out="retention")
    return (
        matrix.select(F.posexplode("retention").alias("row_idx", "row"))
        .select("row_idx", F.posexplode("row").alias("day_offset", "retained"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
