"""Slowly-changing-dimension type 2 versioning — point-in-time
attribute history for dimensions (the user-profile case in a UBA
pipeline: cohort and retention queries need the segment a user was in
WHEN the event happened, not today's value).

Reference parity: no SCD surface in the reference; standard warehouse
semantics (Kimball type 2): each key carries interval-versioned rows
(valid_from, valid_to), exactly one OPEN row (valid_to NULL) per live
key; applying a change snapshot closes the open row at the change's
effective time and opens a new one, attribute-identical changes are
no-ops, and closed history is immutable.

Everything is joins + unions on the KEY — one shuffle each for the
open rows and the change batch; closed history passes through
untouched.

The PERSISTED store (scd2_init / scd2_apply_table) is partitioned by
a ``close_b`` batch column: ``'open'`` for every live row, and the
identifier of the apply batch that closed it for every closed row.
An apply therefore reads ONLY the (partition-pruned) open partition,
and writes ONE dynamic-partition-overwrite job whose output
partitions are exactly ``{'open', '<this batch>'}`` — the open
partition is replaced, the newly-closed rows land in a brand-new
partition, and every prior batch's files are never read or written
(at 100 TB an apply touches |live keys| + |batch| rows, not years of
history — same discipline as rollup_refresh's dynamic partition
overwrite). The single-job commit is also the crash story: a failure
before commit leaves the table byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "scd2_apply",
    "scd2_init",
    "scd2_apply_table",
    "cdc_apply",
    "cdc_init",
    "cdc_refresh",
    "cdc_serve",
    "cdc_vacuum",
]


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_s",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Fold a change snapshot into a type-2 versioned dimension.

    ``current``: (key..., attr..., valid_from, valid_to) with
    valid_to NULL marking each key's single open row. ``changes``:
    (key..., attr..., effective_col); several changes per key are
    allowed — the LATEST per key applies (ties broken by attribute
    order for determinism), matching nightly-snapshot semantics where
    intermediate states were never observed.

    Returns the new version table. Classification per key:
    new key → open row inserted; attributes equal (null-safe) →
    no-op; attributes differ → open row closed at the effective time
    + new open row. A change strictly OLDER than the open row's
    valid_from would create an inverted interval and raises in-plan
    (raise_error) rather than corrupting history.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    open_rows = current.where(F.col(to_col).isNull())
    closed_rows = current.where(F.col(to_col).isNotNull())

    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.desc(effective_col), *[F.asc_nulls_first(a) for a in attrs]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(k).alias(f"__ck_{k}") for k in keys],
            *[F.col(a).alias(f"__ca_{a}") for a in attrs],
            F.col(effective_col).alias("__eff"),
        )
    )

    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"__ck_{k}")
        cond = c if cond is None else (cond & c)
    j = open_rows.join(latest, cond, "full_outer")

    has_open = F.col(from_col).isNotNull()
    has_change = F.col("__eff").isNotNull()
    same = None
    for a in attrs:
        c = F.col(a).eqNullSafe(F.col(f"__ca_{a}"))
        same = c if same is None else (same & c)
    # inverted-interval guard: a change older than the open version
    checked_eff = F.when(
        F.col("__eff") >= F.col(from_col), F.col("__eff")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("scd2_apply: change effective at "),
                F.col("__eff").cast("string"),
                F.lit(" predates the open version's valid_from "),
                F.col(from_col).cast("string"),
            )
        )
    )

    # surviving open rows: no change, or attribute-identical change
    kept_open = j.where(has_open & (~has_change | same)).select(
        *keys, *attrs, from_col, to_col
    )
    # open rows closed by a differing change
    newly_closed = j.where(has_open & has_change & ~same).select(
        *keys, *attrs, from_col, checked_eff.alias(to_col)
    )
    # new open rows: differing change on an existing key, or a new key
    new_open = (
        j.where(has_change & (~has_open | ~same))
        .select(
            *[F.col(f"__ck_{k}").alias(k) for k in keys],
            *[F.col(f"__ca_{a}").alias(a) for a in attrs],
            F.col("__eff").alias(from_col),
            F.lit(None).cast(
                dict(current.dtypes)[to_col]
            ).alias(to_col),
        )
    )
    return (
        closed_rows.select(*keys, *attrs, from_col, to_col)
        .unionByName(kept_open)
        .unionByName(newly_closed)
        .unionByName(new_open)
    )


def scd2_init(
    dim: DataFrame,
    table: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    batch_col: str = "close_b",
) -> None:
    """Materialize the initial version table (``dim`` must already
    carry valid_from/valid_to) as a catalog parquet table partitioned
    by ``batch_col``: open rows under ``'open'``, any seed closed
    history under ``'b0'``."""
    spark = dim.sparkSession
    from datafusion_uba_spark.sources import save_table_recovering_orphan

    part = F.when(F.col(to_col).isNull(), F.lit("open")).otherwise(
        F.lit("b0")
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    save_table_recovering_orphan(
        lambda: dim.withColumn(batch_col, part)
        .write.mode("overwrite")
        .format("parquet")
        .partitionBy(batch_col)
        .saveAsTable(table),
        spark,
        table,
    )


def scd2_apply_table(
    spark,
    table: str,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_s",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    batch_col: str = "close_b",
    batch_id: str | None = None,
) -> str | None:
    """Apply a change batch to a PERSISTED version table in place,
    rewriting ONLY the open partition.

    Reads the partition-pruned ``close_b='open'`` slice (closed
    history is never an input — an apply depends only on the open
    rows and the change batch), folds the batch with scd2_apply, and
    writes the result back in ONE dynamic-partition-overwrite job:
    surviving/new open rows replace the ``'open'`` partition; rows
    closed by this batch land in the brand-new ``close_b=<batch_id>``
    partition. Prior batches' partition files are untouched (pinned
    byte-for-byte in tests/test_uba_ops.py). The single job is the
    crash contract: dynamic overwrite commits partition swaps at job
    commit, so any failure leaves the previous versions live — no
    staging table needed.

    ``batch_id`` defaults to the next free ``b<N>``; an explicit id
    colliding with an existing batch partition (or ``'open'``) raises
    instead of silently replacing history. Returns the batch id used,
    or None if the batch closed no rows (no new partition created).

    CATALOG-CALL BUDGET: exactly ONE metastore call per apply. An
    explicit ``batch_id`` (the production path — date-stamped daily
    applies) costs one partition-PRUNED ``SHOW PARTITIONS …
    PARTITION(...)`` probe, O(1) at any partition count; only
    auto-allocation (``batch_id=None``, a convenience for tests and
    small stores) pays the full partition listing, which at 10^5
    partitions is a driver stall — pass explicit ids there. Whether
    the batch closed rows is read from an ``Observation`` metric on
    the write job itself, not a second catalog walk.
    """
    if batch_id is None:
        # full listing — needed to find the next free id; see budget
        # note above (explicit batch_id avoids this walk entirely)
        existing = {
            r[0].split("=", 1)[1]
            for r in spark.sql(f"SHOW PARTITIONS {table}").collect()
        }
        n = len(existing - {"open"})
        batch_id = f"b{n}"
        while batch_id in existing:
            n += 1
            batch_id = f"b{n}"
    else:
        safe = batch_id.replace("'", "")
        if safe != batch_id:
            raise ValueError(
                f"scd2_apply_table: batch_id {batch_id!r} may not "
                "contain quotes"
            )
        collision = batch_id == "open" or bool(
            spark.sql(
                f"SHOW PARTITIONS {table} "
                f"PARTITION ({batch_col}='{safe}')"
            ).collect()
        )
        if collision:
            raise ValueError(
                f"scd2_apply_table: batch_id {batch_id!r} already exists "
                f"in {table} — reusing it would overwrite closed history"
            )
    current_open = spark.table(table).where(
        F.col(batch_col) == "open"
    ).drop(batch_col)
    new_versions = scd2_apply(
        current_open, changes, key_cols, attr_cols, effective_col,
        from_col, to_col,
    )
    from pyspark.sql import Observation

    out = new_versions.withColumn(
        batch_col,
        F.when(F.col(to_col).isNull(), F.lit("open")).otherwise(
            F.lit(batch_id)
        ),
    ).select(*spark.table(table).columns)  # insertInto is positional
    # observed on the write job itself — no post-write catalog walk
    obs = Observation()
    out = out.observe(
        obs,
        F.sum(
            F.when(F.col(batch_col) != "open", F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("closed"),
    )
    from datafusion_uba_spark.sources import dynamic_partition_overwrite

    with dynamic_partition_overwrite(spark):
        # dynamic mode: overwrite replaces ONLY the partitions present
        # in `out` — 'open' plus (if any rows closed) this batch
        out.write.mode("overwrite").insertInto(table)
    closed = obs.get.get("closed")
    return batch_id if closed else None


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Debezium-style changelog apply: collapse an (upsert|delete)
    stream to the current snapshot under last-writer-wins.

    For every key, the change with the highest ``seq_cols`` ordering
    wins; if that winning change is a delete the key is absent from
    the snapshot. This is the type-1 companion to the module's SCD2
    history: same one-shuffle shape (a key-partitioned window
    row_number), no history retained.

    INCREMENTAL CONTRACT: applying is associative — keep the seq
    columns in the stored snapshot and a new batch folds in as
    ``cdc_apply(snapshot.unionByName(batch), ...)`` with the identical
    result to replaying the full log (pinned by
    tests/test_uba_ops.py::test_cdc_apply_incremental_associative).
    At 100 TB the union's window only re-ranks keys present in the
    new batch against their single stored row — the snapshot side
    contributes one row per key, so the shuffle is bounded by
    |snapshot| + |batch|, never the full historical log.

    ``keep_tombstones=True`` keeps the winning delete rows (with their
    op) instead of dropping them — the PERSISTED-store form: a stored
    tombstone keeps the fold associative even when a later batch
    carries an OLDER change for a deleted key (the stored delete still
    out-ranks it); dropping deletes would silently resurrect the key.
    Serve-time filtering is ``op != delete_op`` (cdc_serve).

    ORDERING CONTRACT: ``seq_cols`` should be a total order per key
    (Debezium's (lsn) / (file, pos) / (ts, txid) all are). As a
    safety net for sources that violate it, every remaining non-key
    column is appended to the window ordering as a deterministic
    final tiebreak — two changes tying on every seq column resolve by
    row CONTENT, never by partition arrival order, so the incremental
    fold stays associative (content-ties are identical rows, where the
    winner is immaterial).
    """
    order = [F.col(c).desc() for c in seq_cols]
    claimed = set(key_cols) | set(seq_cols)
    dtypes = dict(changelog.dtypes)
    order += [
        F.col(c).desc_nulls_last()
        for c in changelog.columns
        # maps are unorderable in Spark ANYWHERE in the type — a bare
        # map<>, an array<map<>>, or a struct with a map field all
        # fail ORDER BY analysis; skip them (still deterministic for
        # well-formed sources where seq_cols is a total order)
        if c not in claimed and "map<" not in dtypes[c]
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ranked = changelog.withColumn("__rn", F.row_number().over(w))
    winners = ranked.where(F.col("__rn") == 1).drop("__rn")
    if keep_tombstones:
        return winners
    return winners.where(F.col(op_col) != delete_op)


def _cdc_bucket(key_cols: list[str], n_buckets: int):
    """Deterministic key-hash bucket for partition-pruned refreshes."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)
    ).cast("int")


def cdc_init(
    changelog: DataFrame,
    table: str,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    n_buckets: int = 64,
) -> None:
    """Materialize the tombstone-carrying CDC snapshot as a catalog
    parquet table PARTITIONED BY a key-hash bucket — the store
    cdc_refresh maintains incrementally. Tombstones are retained
    (keep_tombstones) so refreshes stay associative; read through
    cdc_serve, which filters them. Same store discipline as
    rollup_init / the SCD2 close-batch partitioning: partition layout
    exists so a refresh never touches partitions its batch doesn't."""
    snap = cdc_apply(
        changelog, key_cols, seq_cols, op_col, keep_tombstones=True
    ).withColumn("__bucket", _cdc_bucket(key_cols, n_buckets))
    spark = changelog.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    from datafusion_uba_spark.sources import save_table_recovering_orphan

    save_table_recovering_orphan(
        lambda: snap.write.mode("overwrite")
        .format("parquet")
        .partitionBy("__bucket")
        .saveAsTable(table),
        spark,
        table,
    )


def cdc_refresh(
    batch: DataFrame,
    table: str,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    n_buckets: int = 64,
) -> list[int]:
    """Fold a new changelog batch into the persisted snapshot, reading
    and rewriting ONLY the key-hash buckets the batch touches — the
    rollup_refresh discipline applied to type-1 state: collapse the
    batch per key, union with the stored rows of the affected
    (partition-pruned) buckets, re-apply last-writer-wins, and
    dynamic-partition-overwrite those buckets. Untouched buckets'
    files are never read or written — at 100 TB a refresh costs
    O(batch + touched buckets), never the full key space. Returns the
    affected bucket list (driver-side, bounded by n_buckets).

    Correctness contract (pinned in tests/test_uba_ops.py): after any
    sequence of refreshes, cdc_serve(table) equals cdc_apply over the
    concatenation of all batches — including out-of-order batches
    against deleted keys (stored tombstones out-rank older changes)."""
    spark = batch.sparkSession
    inc = cdc_apply(
        batch, key_cols, seq_cols, op_col, keep_tombstones=True
    ).withColumn("__bucket", _cdc_bucket(key_cols, n_buckets))
    inc = inc.localCheckpoint(eager=False)
    buckets = [r["__bucket"] for r in inc.select("__bucket").distinct().collect()]
    if not buckets:
        return []
    stored = spark.table(table).where(F.col("__bucket").isin(buckets))
    merged = cdc_apply(
        stored.unionByName(inc),
        key_cols,
        seq_cols,
        op_col,
        keep_tombstones=True,
    )
    from datafusion_uba_spark.sources import dynamic_partition_overwrite

    with dynamic_partition_overwrite(spark):
        merged.write.mode("overwrite").format("parquet").insertInto(table)
    return sorted(buckets)


def cdc_serve(
    spark, table: str, op_col: str = "op", delete_op: str = "D"
) -> DataFrame:
    """Current snapshot view of a cdc_init/cdc_refresh store: filters
    the retained tombstones and hides the bucket column."""
    return (
        spark.table(table)
        .where(F.col(op_col) != delete_op)
        .drop("__bucket")
    )


def cdc_vacuum(
    spark,
    table: str,
    seq_col: str,
    horizon,
    op_col: str = "op",
    delete_op: str = "D",
) -> dict:
    """Garbage-collect stored tombstones older than ``horizon``.

    Tombstones exist to out-rank late out-of-order changes
    (cdc_apply keep_tombstones); once the ingest watermark guarantees
    no change with ``seq < horizon`` can still arrive, those tombstones
    are dead weight. This rewrites ONLY the buckets that hold such
    tombstones (dynamic partition overwrite, the cdc_refresh
    discipline) — live rows and younger tombstones pass through
    untouched, other buckets' files are never written. Finding the
    victims is one read-only filter scan of the snapshot (bounded by
    the KEY space, not the log).

    THE HORIZON IS A CONTRACT: vacuuming ahead of the true watermark
    re-opens the resurrection window the tombstone closed. Returns
    {"buckets": [...], "removed": n}.
    """
    t = spark.table(table)
    dead = (F.col(op_col) == delete_op) & (F.col(seq_col) < F.lit(horizon))
    victims = t.where(dead).localCheckpoint(eager=False)
    buckets = [
        r["__bucket"] for r in victims.select("__bucket").distinct().collect()
    ]
    if not buckets:
        return {"buckets": [], "removed": 0}
    removed = victims.count()
    # EAGER checkpoint before the overwrite: the keep-set is read from
    # the very table being rewritten, and a pure filter scan (no
    # shuffle in between, unlike cdc_refresh's windowed merge) would
    # otherwise still be reading the files the job replaces
    keep = (
        t.where(F.col("__bucket").isin(buckets))
        .where(~dead)
        .localCheckpoint()
    )
    # dynamic overwrite only replaces partitions PRESENT in the write —
    # a bucket whose rows were all tombstones yields no output rows and
    # would survive untouched; such buckets are dropped explicitly
    written = {
        r["__bucket"] for r in keep.select("__bucket").distinct().collect()
    }
    from datafusion_uba_spark.sources import (
        drop_partition,
        dynamic_partition_overwrite,
    )

    if written:
        with dynamic_partition_overwrite(spark):
            keep.write.mode("overwrite").format("parquet").insertInto(table)
    for b in sorted(set(buckets) - written):
        drop_partition(spark, table, "__bucket", b)
    return {"buckets": sorted(buckets), "removed": removed}
