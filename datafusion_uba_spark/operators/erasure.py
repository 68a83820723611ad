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
  partition overwrite (sources.dynamic_partition_overwrite, the
  rollup_refresh pattern). Untouched partitions' files are never read
  or written — pinned by mtime equality in tests/test_uba_ops.py. The
  kept rows are eagerly localCheckpoint-ed BEFORE the overwrite (the
  cdc_vacuum discipline, operators/scd.py): the broadcast anti-join is
  shuffle-free on the stored side, so without the barrier the write
  job would still be reading the files it replaces, and the
  fully-erased-partition detection below would re-scan the MUTATED
  table.
- **Unpartitioned table**: a full anti-join rewrite through the
  staged-swap discipline (sources.staged_swap_tables): the new table
  lands under a ``__stage`` name and swaps by rename, so a failed
  build leaves the previous table live and a failed swap leaves the
  new data intact under its staging name. The rewrite preserves the
  table's storage provider (read from the catalog); tables with a
  BUCKETING spec are refused loudly — a silent rebucketless rewrite
  would break every downstream shuffle-free-join plan pin — erase
  those with an explicit write_bucketed rebuild.

NULL handling, both loud and safe:

- NULL **subject keys** identify nobody and are NOT erasable: they
  never match the cohort (standard join NULL semantics) and are kept —
  an erasure that silently dropped unattributed rows would destroy
  data outside the request's scope.
- NULL **partition values** holding cohort rows are refused with a
  ValueError naming the fix (run with ``partition_col=None`` for a
  full staged rewrite): Spark's isin/DROP PARTITION cannot address the
  __HIVE_DEFAULT_PARTITION__ by value, so the partition-wise path
  would silently skip those rows — an RTBF violation worse than the
  error.

Returns the audit record a deletion pipeline logs next to the DSR
ticket: rows_removed (exact), n_subjects (distinct non-NULL keys the
request resolved to — reconcile against the ticket's raw list
upstream), and the rewritten partition values (empty for the
unpartitioned path).

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


def _table_detail(spark: SparkSession, table: str) -> dict[str, str]:
    """(col_name -> data_type) of DESCRIBE FORMATTED's metadata rows."""
    return {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r["col_name"]
    }


def erasure_apply(
    spark: SparkSession,
    table: str,
    key_col: str,
    subjects: DataFrame,
    partition_col: str | None = None,
) -> dict:
    """Delete all rows of ``table`` whose ``key_col`` appears in the
    one-column ``subjects`` cohort frame. See module docstring for the
    two rewrite strategies and the NULL contracts."""
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
    # the table's REAL partition spec, from catalog metadata — being a
    # column of the table is NOT enough: dynamic overwrite replaces
    # whole physical partitions, so a partition_col that is merely a
    # data column would make the overwrite destroy every out-of-scope
    # row in the partitions it touches. Validate BEFORE any write.
    part_cols = [
        c.name for c in spark.catalog.listColumns(table) if c.isPartition
    ]
    if partition_col is not None and part_cols != [partition_col]:
        raise ValueError(
            f"erasure_apply: {table!r} is partitioned by {part_cols}, "
            f"not by partition_col {partition_col!r}; the partition-wise "
            "path must address the table's actual (single) partition "
            "column or the dynamic overwrite would delete rows outside "
            "the request's scope — pass the real partition column, or "
            "partition_col=None for a full staged rewrite"
        )

    if partition_col is None:
        detail = _table_detail(spark, table)
        if "Num Buckets" in detail or "Bucket Columns" in detail:
            raise ValueError(
                f"erasure_apply: {table!r} is bucketed; a plain staged "
                "rewrite would silently drop its bucketing spec and "
                "break shuffle-free-join plans downstream — rebuild it "
                "with sources.write_bucketed on the anti-joined frame "
                "instead"
            )
        provider = detail.get("Provider", "parquet")
        removed = stored.join(
            F.broadcast(cohort), key_col, "left_semi"
        ).count()
        if removed:
            from datafusion_uba_spark.sources import (
                save_table_recovering_orphan,
                staged_swap_tables,
            )

            kept = stored.join(F.broadcast(cohort), key_col, "left_anti")

            def write(stage: str) -> None:
                # a partitioned table's staged rewrite must carry the
                # partition spec forward — this path is exactly what the
                # NULL-partition ValueError above sends callers to, and
                # silently swapping in an UNPARTITIONED replacement
                # would break every partition-pruned reader (and a later
                # partition-wise erasure_apply) downstream
                w = kept.write.mode("overwrite").format(provider)
                if part_cols:
                    w = w.partitionBy(*part_cols)
                save_table_recovering_orphan(
                    lambda: w.saveAsTable(stage),
                    spark,
                    stage,
                )

            staged_swap_tables(spark, [(table, write)])
        return {
            "rows_removed": removed,
            "n_subjects": n_subjects,
            "partitions_rewritten": [],
        }

    # partitioned path: find the partitions the cohort actually
    # touches (pushed-filter scan projected to the partition column),
    # then rewrite only those
    from datafusion_uba_spark.sources import (
        drop_partition,
        dynamic_partition_overwrite,
    )

    affected_raw = [
        r[partition_col]
        for r in stored.join(F.broadcast(cohort), key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if None in affected_raw:
        raise ValueError(
            f"erasure_apply: cohort rows of {table!r} live in the NULL "
            f"{partition_col!r} partition, which the partition-wise "
            "rewrite cannot address (isin/DROP PARTITION skip NULL) — "
            "run with partition_col=None for a full staged rewrite"
        )
    affected = sorted(affected_raw)
    if not affected:
        return {
            "rows_removed": 0,
            "n_subjects": n_subjects,
            "partitions_rewritten": [],
        }
    scoped = stored.where(F.col(partition_col).isin(affected))
    removed = scoped.join(F.broadcast(cohort), key_col, "left_semi").count()
    # EAGER barrier before the self-overwrite (cdc_vacuum discipline):
    # materialize the kept rows now, while the files they come from
    # are still live, and derive `surviving` from the SAME materialized
    # frame — never from a re-scan of the table the write mutates.
    kept = (
        scoped.join(F.broadcast(cohort), key_col, "left_anti")
        .select(*stored.columns)
        .localCheckpoint()
    )
    surviving = {
        r[partition_col]
        for r in kept.select(partition_col).distinct().collect()
    }
    if surviving:
        with dynamic_partition_overwrite(spark):
            # replaces ONLY the partitions present in `kept`
            kept.write.mode("overwrite").insertInto(table)
    # a partition whose EVERY row was in the cohort has no surviving
    # rows, so dynamic overwrite leaves its old files live — drop it
    for p in affected:
        if p not in surviving:
            drop_partition(spark, table, partition_col, p)
    return {
        "rows_removed": removed,
        "n_subjects": n_subjects,
        "partitions_rewritten": affected,
    }
