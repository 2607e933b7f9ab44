"""Incremental maintenance of a materialized JOIN view (delta joins).

`operators/aggstate.py` maintains materialized AGGREGATES incrementally
(the reference lifecycle generalized to a state table); this module is
the JOIN half of incremental view maintenance: keep ``V = A ⋈ B``
(inner equi join) current under CDC batches against either or both
bases WITHOUT re-joining the full tables.

Classical delta-join algebra, specialized to keyed upsert/delete
batches (the shape ``operators/merge.py::latest_changes`` produces —
at most one change per base key):

    V' =   V  minus  rows touching any changed A-key or B-key
         ∪ ΔA_upserts ⋈ B'                 (changed A against all of new B)
         ∪ A'∖ΔA-keys ⋈ ΔB_upserts        (changed B against the UNchanged A)

Every surviving pair is emitted exactly once: a pair with a changed B
row comes from the first delta term, a pair whose only change is on
the A side comes from the second (which excludes changed-B rows
to avoid double counting... — see term construction below: the roles
are symmetric, this module fixes ΔB⋈A' and ΔA⋈(B'∖ΔB)), and untouched
pairs survive the anti joins. Join-key updates and deletes need no
special casing: the old pair dies via the key anti join, the new pair
(if any) is produced by a delta term.

Scale (100 TB view, MB..GB deltas): the view and the base snapshots
are NEVER shuffled — the removals are broadcast anti joins on the
delta key sets, and each delta term broadcasts the delta side of the
join, so maintenance cost is O(|V| + |A'| + |B'|) scan work plus
delta-sized join output, versus a full re-join's two giant shuffles.
Pass ``broadcast_deltas=False`` for backfill-sized batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _equi(a: DataFrame, b: DataFrame, on: list[tuple[str, str]]) -> Column:
    cond = a[on[0][0]] == b[on[0][1]]
    for ac, bc in on[1:]:
        cond = cond & (a[ac] == b[bc])
    return cond


def maintain_join_view(
    view: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    da: DataFrame,
    db: DataFrame,
    a_keys: list[str],
    b_keys: list[str],
    on: list[tuple[str, str]],
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_deltas: bool = True,
) -> DataFrame:
    """One maintenance step: fold collapsed CDC batches ``da`` / ``db``
    into the materialized inner-join view.

    ``view`` holds A's columns followed by B's (disjoint names, as a
    join of the bases produces). ``a_new`` / ``b_new`` are the
    POST-apply base snapshots (``merge.apply_changes`` output — the
    caller maintains bases and view from the same batch). ``da`` /
    ``db`` carry the full base schema plus ``op_col`` and at most one
    row per key (collapse a log with ``merge.latest_changes`` first);
    pass an empty-but-schema'd delta for an unchanged side.

    Returns V' with exactly the view's columns."""
    da_keys = da.select(*a_keys).distinct()
    db_keys = db.select(*b_keys).distinct()
    if broadcast_deltas:
        da_keys, db_keys = F.broadcast(da_keys), F.broadcast(db_keys)

    survivors = view.join(da_keys, a_keys, "left_anti").join(
        db_keys, b_keys, "left_anti"
    )

    a_up = da.filter(F.col(op_col) != F.lit(delete_op)).select(*a_new.columns)
    b_up = db.filter(F.col(op_col) != F.lit(delete_op)).select(*b_new.columns)
    if broadcast_deltas:
        a_up, b_up = F.broadcast(a_up), F.broadcast(b_up)

    # ΔA upserts joined to ALL of new B (covers pairs where both sides
    # changed), then ΔB upserts joined to new A MINUS the changed
    # A-keys (already covered above) — disjoint by construction.
    term_a = a_up.join(b_new, _equi(a_up, b_new, on), "inner")
    a_unchanged = a_new.join(da_keys, a_keys, "left_anti")
    term_b = a_unchanged.join(
        b_up, _equi(a_unchanged, b_up, on), "inner"
    )

    cols = view.columns
    return (
        survivors.select(*cols)
        .unionByName(term_a.select(*cols))
        .unionByName(term_b.select(*cols))
    )
