"""MERGE INTO / CDC-apply for snapshot maintenance.

The reference computes over immutable host tables; a production corpus
is maintained by applying change batches (upserts + deletes) to a
snapshot — the ``MERGE INTO target USING changes`` statement warehouses
run nightly, and the operation a Structured Streaming ``foreachBatch``
sink runs per micro-batch for continuous ingestion.

Spark-first shape (no Delta/Iceberg table format needed — the merge is
a plain declarative plan over two DataFrames):

- ``latest_changes`` collapses a change LOG (many changes per key) to
  the last change per key: one window shuffle on the key.
- ``apply_changes`` merges the collapsed batch into the snapshot:
  survivors = target LEFT ANTI changed-keys; upserts = the non-delete
  changes; result = survivors UNION ALL upserts.
- ``merge_scd2`` is the history-keeping variant (slowly-changing
  dimension type 2): instead of overwriting, it closes the current
  version of each changed key and appends the new version.

Scale (100 TB snapshot, MB..GB change batch): the change batch is the
small side, so the anti join BROADCASTS its key set — the snapshot is
never shuffled, the merge is one scan of the target plus a map-side
hash lookup. Writing the merged snapshot partition-aligned with the
target (same clustering) keeps the next merge's scan pruned. With a
non-tiny batch, Spark falls back to a shuffled anti join on the key —
still one shuffle of each side, no fan-out (anti join emits at most
its left input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change log to the LAST change per key.

    ``seq_col`` is the total change order (log sequence number /
    commit timestamp); ties break on the op so the collapse is
    deterministic even on malformed logs that reuse a sequence
    number. One window shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_changes: bool = True,
) -> DataFrame:
    """MERGE semantics over DataFrames: upsert non-delete changes,
    drop deleted keys, keep everything else.

    ``changes`` must hold at most ONE row per key (collapse a log with
    ``latest_changes`` first) and carry the full target schema plus
    ``op_col``. Matched+non-delete => the change row replaces the
    target row; matched+delete => the key disappears; unmatched
    non-delete => inserted. Column order follows the target schema.

    ``broadcast_changes`` pins the typical CDC shape (small batch,
    huge snapshot): the anti join broadcasts the batch's key set and
    the snapshot never shuffles. A FORCED broadcast of a huge batch
    would overwhelm executors, so pass ``False`` for backfill-sized
    batches — the anti join then shuffles both sides on the key (AQE
    may still downgrade to broadcast at runtime if the key set turns
    out small).

    NULL keys are matched null-safely (``eqNullSafe`` anti join), so a
    change row keyed NULL replaces/deletes the NULL-keyed target row
    exactly like any other key — keeping the documented round-trip law
    ``apply_changes(old, diff_snapshots(old, new)) == new`` true for
    NULL keys too."""
    changed_keys = changes.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols]
    ).distinct()
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)
    cond = None
    for k in key_cols:
        c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
        cond = c if cond is None else cond & c
    survivors = target.join(changed_keys, cond, "left_anti")
    upserts = changes.filter(F.col(op_col) != F.lit(delete_op)).select(
        *target.columns
    )
    return survivors.unionByName(upserts)


def merge_scd2(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: history-preserving merge.

    ``target`` rows carry ``valid_from``/``valid_to``/``is_current``;
    ``changes`` rows carry the attribute columns plus ``seq_col`` (the
    new version's effective sequence) and ``op_col``. For each changed
    key: the CURRENT target version is closed (``valid_to`` = the
    change's sequence, ``is_current`` = false); a non-delete change
    appends a new open version. Historical (already-closed) rows pass
    through untouched — the anti join tests only current rows, so the
    history is never shuffled when the batch key set broadcasts.

    Dimension keys must be non-NULL (a NULL business key has no
    versioned identity): NULL-keyed rows never match the standard key
    joins here, so a NULL-keyed change appends without closing
    anything. Use ``apply_changes``/``diff_snapshots`` (null-safe) if
    NULL keys are real in your data."""
    attr_cols = [c for c in changes.columns if c not in (op_col, seq_col)]
    batch = latest_changes(changes, key_cols, seq_col, op_col)
    batch_keyed = F.broadcast(
        batch.select(*key_cols, F.col(seq_col).alias("__new_seq"))
    )

    history = target.filter(~F.col(current_flag))
    current = target.filter(F.col(current_flag))
    untouched = current.join(batch_keyed.select(*key_cols), key_cols, "left_anti")
    closed = (
        current.join(batch_keyed, key_cols, "inner")
        .withColumn(valid_to, F.col("__new_seq"))
        .withColumn(current_flag, F.lit(False))
        .drop("__new_seq")
    )
    opened = (
        batch.filter(F.col(op_col) != F.lit(delete_op))
        .select(
            *attr_cols,
            F.col(seq_col).cast("long").alias(valid_from),
            F.lit(None).cast("long").alias(valid_to),
            F.lit(True).alias(current_flag),
        )
    )
    return (
        history.select(*target.columns)
        .unionByName(untouched.select(*target.columns))
        .unionByName(closed.select(*target.columns))
        .unionByName(opened.select(*target.columns))
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """The INVERSE of ``apply_changes``: derive the minimal change log
    that turns snapshot ``old`` into snapshot ``new`` — insert rows for
    keys only in ``new``, delete rows for keys only in ``old``, update
    rows for keys whose non-key values differ (value-identical rows
    emit nothing). Output carries the full ``new`` schema plus
    ``op_col`` in {'I','U','D'} (delete rows carry the OLD values), one
    row per changed key — already collapsed, so it feeds
    ``apply_changes`` directly, and by construction::

        apply_changes(old, diff_snapshots(old, new, keys), keys) == new

    (the round-trip law, property-tested). This is how a CDC log is
    RECOVERED when the upstream provides only periodic full snapshots
    — table-diff as an operator.

    Scale shape: one full-outer join on the key (both snapshots shuffle
    once — unavoidable for a diff; store snapshots bucketed by the key
    to make it exchange-free) with change detection via a null-safe
    struct comparison (NULL-valued columns compare as equal-to-NULL,
    not as always-changed). The join itself matches on ``eqNullSafe``,
    so NULL keys diff like any other key value — side presence is
    detected by explicit marker columns, NOT by a key column's
    NULL-ness (which would misclassify every NULL-keyed row)."""
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in new.columns],
        F.lit(True).alias("__n_present"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    same_vals = None
    for c in val_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same_vals = eq if same_vals is None else same_vals & eq
    if same_vals is None:  # key-only table: matched keys are identical
        same_vals = F.lit(True)
    op = (
        F.when(in_old & ~in_new, F.lit(delete_op))
        .when(~in_old & in_new, F.lit("I"))
        .when(in_old & in_new & ~same_vals, F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
        if c in key_cols
        else F.when(in_new, F.col(f"__n_{c}")).otherwise(F.col(f"__o_{c}")).alias(c)
        for c in new.columns
    ]
    return j.withColumn(op_col, op).filter(F.col(op_col).isNotNull()).select(
        *out_cols, op_col
    )
