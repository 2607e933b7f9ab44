"""Adaptive physical-tier routing for grouped exact distinct counts.

The reference ships ONE physical strategy — a fixed 300k-bucket hash
table per group (`hashset-count.cc:67`) — and its README tells the user
when not to use it ("intended for counting sessions[...] approximate
counting is recommended for very large numbers", `README.md:10-11`).
That advice lives in prose; the user is the query planner. This module
makes it executable: pick the physical tier FROM THE DATA, the way
Spark's AQE picks join strategies from runtime statistics — the engine
owns the how, the user states the what.

Tiers routed between (all exact, all carrying the reference's output
contract — STRING count, NULL-not-0 on empty, `hashset-count.cc:464-524`):

- ``bitmap``             exact bitmap NDV (``operators/bitmap_distinct``):
                         two codegen'd hash aggregations, state bounded
                         by the VALUE RANGE — unbeatable when the domain
                         is a dense integer id space;
- ``spillable_distinct`` tier a (codegen ``count_distinct``): Expand +
                         partial/final hash agg, spills, no Python —
                         the safe choice for very high per-group NDV;
- ``faithful_udaf``      the faithful pandas UDAF lifecycle
                         (``make_hashset_count_udaf``) — the reference's
                         own sweet spot, moderate per-group sets.

Routing inputs — ONE codegen stats job ending in a single driver action
on a one-row aggregate (the same documented stats-prerequisite pattern
as the guarded tier's histogram count, `plans/parity.py::_hct_guard`;
production would pass a known catalog histogram instead):

- ``nnz``        total non-NULL value rows (0 means nothing to count);
- ``vmin/vmax``  exact value range — integral value columns only;
- ``smax``       max per-group DETERMINISTIC sampled distinct count:
                 distinct values whose 52-bit content hash
                 (``operators/kmv.kmv_hash`` — md5-derived, seedless)
                 falls below ``HASH_SPACE >> sample_shift``. Scaling by
                 ``1 << sample_shift`` estimates per-group NDV
                 (Gibbons' distinct sampling); content-hashing makes the
                 estimate a pure function of the value set, so any
                 engine with md5 recomputes it bit-for-bit.

Decision — pure integer arithmetic, mirrored verbatim by the DuckDB
oracle of the ``auto`` arm (`plans/parity.py::_hct_auto`), so the
routing DECISION sits under the driver's value hash, not just the
routed counts:

1. ``nnz == 0``                                     -> ``faithful_udaf``
2. integral and ``vmax - vmin < bitmap_max_range``  -> ``bitmap``
3. ``(smax << sample_shift) > ndv_threshold``       -> ``spillable_distinct``
4. otherwise                                        -> ``faithful_udaf``

The default ``ndv_threshold`` is 300_000 — the reference's own
documented capacity boundary (`README.md:10-11`, `hashset-count.cc:67`).

Scale (100 TB): the stats job is one grouped codegen aggregation with
map-side partial combine (count/min/max, plus a count-distinct whose
Expand carries only the ~1/2^shift hash-sampled slice of values); the
driver receives ONE row. Route choice then plans exactly one of the
three tiers — never more than one pass framework, no fallback re-run.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bitmap_distinct import bitmap_distinct_count
from .hashset_count import hashset_count_agg, make_hashset_count_udaf
from .kmv import HASH_SPACE, kmv_hash

#: Spark simple-string dtypes eligible for the bitmap tier.
INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}

#: Route names (also the tier tags under the driver hash).
ROUTE_BITMAP = "bitmap"
ROUTE_SPILLABLE = "spillable_distinct"
ROUTE_FAITHFUL = "faithful_udaf"


@dataclass(frozen=True)
class RouteStats:
    """The one-row stats prerequisite, exact and deterministic."""

    nnz: int  # non-NULL value rows
    smax: int  # max per-group hash-sampled distinct count
    vmin: int | None  # exact min (integral value cols only)
    vmax: int | None  # exact max (integral value cols only)
    integral: bool
    sample_shift: int

    @property
    def ndv_estimate(self) -> int:
        return self.smax << self.sample_shift


def auto_route_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    sample_shift: int = 6,
) -> RouteStats:
    """Compute the routing statistics in ONE grouped codegen job plus a
    one-row final aggregate (single driver action). All four numbers
    are exact deterministic functions of the data — min/max/count are
    plain aggregates and the sampled distinct count uses the seedless
    content hash — so the route is reproducible by any engine."""
    integral = dict(df.dtypes)[value_col] in INTEGRAL_TYPES
    v = F.col(value_col)
    threshold = HASH_SPACE >> sample_shift
    per_group = [
        F.count(v).alias("__nn"),
        F.count_distinct(F.when(kmv_hash(v) < threshold, v)).alias("__s"),
    ]
    final = [
        F.coalesce(F.sum("__nn"), F.lit(0)).alias("nnz"),
        F.coalesce(F.max("__s"), F.lit(0)).alias("smax"),
    ]
    if integral:
        per_group += [
            F.min(v).cast("long").alias("__lo"),
            F.max(v).cast("long").alias("__hi"),
        ]
        final += [F.min("__lo").alias("vmin"), F.max("__hi").alias("vmax")]
    row = (
        df.groupBy(*group_cols).agg(*per_group).agg(*final).first()
    )
    return RouteStats(
        nnz=int(row["nnz"]),
        smax=int(row["smax"]),
        vmin=(None if not integral or row["vmin"] is None else int(row["vmin"])),
        vmax=(None if not integral or row["vmax"] is None else int(row["vmax"])),
        integral=integral,
        sample_shift=sample_shift,
    )


def choose_route(
    stats: RouteStats,
    bitmap_max_range: int = 1 << 26,
    ndv_threshold: int = 300_000,
) -> str:
    """The routing decision — pure integer arithmetic over the stats
    row, in this exact branch order (the DuckDB oracle mirrors it
    verbatim; reorder only in lockstep with `plans/parity.py`)."""
    if stats.nnz == 0:
        return ROUTE_FAITHFUL
    if (
        stats.integral
        and stats.vmin is not None
        and stats.vmax - stats.vmin < bitmap_max_range
    ):
        return ROUTE_BITMAP
    if stats.ndv_estimate > ndv_threshold:
        return ROUTE_SPILLABLE
    return ROUTE_FAITHFUL


def hashset_count_auto(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bitmap_max_range: int = 1 << 26,
    ndv_threshold: int = 300_000,
    sample_shift: int = 6,
    stats: RouteStats | None = None,
) -> tuple[DataFrame, str]:
    """Grouped exact distinct count with ENGINE-CHOSEN physical tier.

    Returns ``(result, route)`` where ``result`` has the columns
    ``(*group_cols, hashset_count)`` — identical values on every route
    (all three tiers are exact and carry the reference's STRING /
    NULL-not-0 contract) — and ``route`` names the tier the stats
    selected. Exactly one tier is planned; the stats job is the only
    extra work.

    ``stats``: pass a previously computed :class:`RouteStats` to skip
    the stats pass entirely — the production path at corpus scale,
    where the numbers come from a maintained catalog (ANALYZE-style
    table stats, or the repo's own stored sketch/state tables) rather
    than a fresh full-table scan per query. Every field is exact and
    content-derived, so a cached row stays valid until the data
    changes — and a STALE row can only mis-route, never mis-count:
    all three tiers return identical values.
    """
    group_cols = list(group_cols)
    if stats is None:
        stats = auto_route_stats(df, group_cols, value_col, sample_shift)
    route = choose_route(stats, bitmap_max_range, ndv_threshold)
    if route == ROUTE_BITMAP:
        out = bitmap_distinct_count(df, group_cols, value_col)
    elif route == ROUTE_SPILLABLE:
        out = df.groupBy(*group_cols).agg(
            hashset_count_agg(value_col).alias("hashset_count")
        )
    else:
        udaf = make_hashset_count_udaf()
        out = df.groupBy(*group_cols).agg(
            udaf(F.col(value_col)).alias("hashset_count")
        )
    return out, route
