"""Right-to-be-forgotten EXECUTION — the destructive half of the RTBF
story whose dry run is queries_uba.q_erasure_audit.

``erasure_apply`` deletes every row whose subject key is in a DSR
(data-subject-request) cohort from a persisted catalog table, the way
a 100 TB store has to do it:

- **Partitioned table** (``partition_col`` given): the affected
  partition values are discovered with one broadcast semi-join
  projected to the partition column (metadata-sized: a cohort touches
  days, not history), and ONLY those partitions are rewritten — an
  anti-join against the broadcast cohort, committed via dynamic
  partition overwrite (the rollup_refresh pattern,
  operators/rollup.py:198-205). Untouched partitions' files are never
  read or written — pinned by mtime equality in tests/test_uba_ops.py.
- **Unpartitioned table**: a full anti-join rewrite through the
  staged-swap discipline (sources.staged_swap_tables): the new table
  lands under a ``__stage`` name and swaps by rename, so a failed
  build leaves the previous table live and a failed swap leaves the
  new data intact under its staging name.

NULL subject keys identify nobody and are therefore NOT erasable:
they never match the cohort (standard join NULL semantics) and are
kept — an erasure that silently dropped unattributed rows would
destroy data outside the request's scope.

Returns the audit record a deletion pipeline logs next to the DSR
ticket: rows_removed (exact), n_subjects_requested, and the rewritten
partition values (empty for the unpartitioned path).

Crash contract: the whole operation is IDEMPOTENT — re-running the
same request after any failure (mid-overwrite, between the overwrite
and a fully-erased partition's explicit drop) converges to the same
final state with a zero-or-smaller rows_removed, so the recovery
procedure is simply "run it again".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["erasure_apply"]


def erasure_apply(
    spark: SparkSession,
    table: str,
    key_col: str,
    subjects: DataFrame,
    partition_col: str | None = None,
) -> dict:
    """Delete all rows of ``table`` whose ``key_col`` appears in the
    one-column ``subjects`` cohort frame. See module docstring for the
    two rewrite strategies and the NULL-key contract."""
    if len(subjects.columns) != 1:
        raise ValueError(
            "subjects must be a one-column frame of subject keys; got "
            f"columns {subjects.columns}"
        )
    cohort = (
        subjects.toDF(key_col)
        .where(F.col(key_col).isNotNull())
        .distinct()
    )
    n_subjects = cohort.count()  # DSR lists are small by construction
    stored = spark.table(table)
    if partition_col is not None and partition_col not in stored.columns:
        raise ValueError(
            f"partition_col {partition_col!r} not in table columns "
            f"{stored.columns}"
        )

    if partition_col is None:
        removed = stored.join(F.broadcast(cohort), key_col, "left_semi").count()
        if removed:
            from datafusion_uba_spark.sources import (
                save_table_recovering_orphan,
                staged_swap_tables,
            )

            kept = stored.join(F.broadcast(cohort), key_col, "left_anti")

            def write(stage: str) -> None:
                save_table_recovering_orphan(
                    lambda: kept.write.mode("overwrite")
                    .format("parquet")
                    .saveAsTable(stage),
                    spark,
                    stage,
                )

            staged_swap_tables(spark, [(table, write)])
        return {
            "rows_removed": removed,
            "n_subjects_requested": n_subjects,
            "partitions_rewritten": [],
        }

    # partitioned path: find the partitions the cohort actually
    # touches (pushed-filter scan projected to the partition column),
    # then rewrite only those
    affected = sorted(
        r[partition_col]
        for r in stored.join(F.broadcast(cohort), key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    )
    if not affected:
        return {
            "rows_removed": 0,
            "n_subjects_requested": n_subjects,
            "partitions_rewritten": [],
        }
    scoped = stored.where(F.col(partition_col).isin(affected))
    removed = scoped.join(F.broadcast(cohort), key_col, "left_semi").count()
    kept = scoped.join(F.broadcast(cohort), key_col, "left_anti").select(
        *stored.columns
    )
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # dynamic mode replaces ONLY the partitions present in `kept`.
        # Corner: a partition whose EVERY row is in the cohort has no
        # surviving rows in `kept`, so dynamic overwrite would leave
        # its old files live — rewrite detects that and drops the
        # partition explicitly below.
        kept.write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    surviving = {
        r[partition_col]
        for r in kept.select(partition_col).distinct().collect()
    }
    for p in affected:
        if p not in surviving:
            # quote everything non-numeric (str, date, timestamp —
            # their str() forms are valid SQL literals when quoted)
            v = (
                str(p)
                if isinstance(p, (int, float)) and not isinstance(p, bool)
                else "'" + str(p).replace("'", "''") + "'"
            )
            spark.sql(
                f"ALTER TABLE {table} DROP IF EXISTS "
                f"PARTITION ({partition_col} = {v})"
            )
    return {
        "rows_removed": removed,
        "n_subjects_requested": n_subjects,
        "partitions_rewritten": affected,
    }
