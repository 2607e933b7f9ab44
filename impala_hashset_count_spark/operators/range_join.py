"""Binned range join — point-in-interval joins without a nested loop.

A join whose ONLY predicate is a range containment
(``p BETWEEN start AND end``) has no equi-key, so Spark plans
BroadcastNestedLoopJoin (fine when one side broadcasts) or a cartesian
product (fatal at scale). The reference never needs this (its merge is
keyed, `/root/reference/README.md:41`), but a host SQL surface does —
point-in-window lookups, IP-range maps, time-interval containment.

The standard fix (the "range join optimization" in Databricks/Photon,
DuckDB's IEJoin being the other family) is BINNING: quantize the range
dimension into fixed-width bins, explode each interval onto every bin
it overlaps, tag each point with its single containing bin, equi-join
on the bin id, and re-check the exact predicate as a residual filter.
Each (point, interval) match is discovered exactly once — the point
lives in exactly one bin, and the interval appears at most once in
that bin — so no dedup pass is needed.

Scale (100 TB): the equi-join on ``__bin`` is a plain shuffle hash /
sort-merge join — both sides partition by bin, no broadcast, no
quadratic work. Cost knobs:

- ``bin_width`` ~ the typical interval length. Too small -> intervals
  explode onto many bins (row blowup = avg_len/width + 1); too large
  -> many false candidates reach the residual filter. width == typical
  length keeps both O(1) per interval.
- ``max_bins_per_interval`` guards the degenerate giant interval (the
  skew twin of ``max_bucket_docs`` in `operators/dedup.py`): intervals
  wider than the cap are routed to a separate tiny relation and
  nested-loop-joined as a broadcast side instead of exploding — at any
  realistic width the "wide" side is a handful of rows.

Works on any numeric range dimension; date/timestamp callers quantize
to epoch days/seconds first (exact integer arithmetic, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(col: Column, width: int | float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int | float,
    max_bins_per_interval: int | None = 256,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them
    (``start <= p <= end``, both ends inclusive), as a binned equi-join.

    Returns all columns of both inputs. Intervals with ``end < start``
    match nothing (dropped, as in the naive predicate). NULL endpoints
    or points match nothing (SQL three-valued logic).

    Intervals spanning more than ``max_bins_per_interval`` bins are
    split off and joined via a broadcast nested loop — exact same
    semantics, and it keeps one mis-sized outlier from exploding the
    bin fan-out (pass ``None`` to disable the guard)."""
    p = F.col(point_col)
    s, e = F.col(start_col), F.col(end_col)
    valid = intervals.filter(s.isNotNull() & e.isNotNull() & (s <= e))
    n_bins = _bin(e, bin_width) - _bin(s, bin_width) + 1

    narrow = valid
    wide = None
    if max_bins_per_interval is not None:
        narrow = valid.filter(n_bins <= max_bins_per_interval)
        wide = valid.filter(n_bins > max_bins_per_interval)

    exploded = narrow.withColumn(
        "__bin",
        F.explode(F.sequence(_bin(s, bin_width), _bin(e, bin_width))),
    )
    pts = points.withColumn("__bin", _bin(p, bin_width))
    out = (
        pts.join(exploded, on="__bin", how="inner")
        .filter((p >= s) & (p <= e))
        .drop("__bin")
    )
    if wide is not None:
        # the wide remainder is tiny by construction -> broadcast NLJ
        out = out.unionByName(
            points.join(F.broadcast(wide), on=[(p >= s) & (p <= e)])
        )
    return out


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int | float,
    max_bins_per_interval: int | None = 256,
) -> DataFrame:
    """Inner join of every OVERLAPPING interval pair
    (``l_start <= r_end AND r_start <= l_end``, ends inclusive) — the
    interval-x-interval generalization of ``binned_range_join``, for
    span-vs-span workloads (sessions x incident windows, ad exposure x
    conversion windows, shipment x promotion periods).

    Both sides explode onto fixed-width bins and equi-join on the bin
    id; a pair sharing k bins would surface k times, so the join keeps
    only the FIRST shared bin — ``__bin == greatest(start_bin_l,
    start_bin_r)``. For an overlapping pair that bin is spanned by both
    sides (bin() is monotone, so overlap puts each start bin at or
    before the other side's end bin), hence exactly one surviving
    candidate per pair, then the exact overlap predicate runs as the
    residual. Same scale shape as the point variant: a plain shuffle
    join keyed on bins, no broadcast of the big sides, no quadratic
    work; intervals wider than ``max_bins_per_interval`` bins on either
    side split off to a broadcast NLJ remainder (tiny by construction).

    Returns all columns of both inputs (caller ensures distinct names).
    Intervals with ``end < start`` or NULL endpoints match nothing."""
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    overlap = (ls <= re_) & (rs <= le)
    lv = left.filter(ls.isNotNull() & le.isNotNull() & (ls <= le))
    rv = right.filter(rs.isNotNull() & re_.isNotNull() & (rs <= re_))

    def split(df, s, e):
        n_bins = _bin(e, bin_width) - _bin(s, bin_width) + 1
        if max_bins_per_interval is None:
            return df, None
        return (
            df.filter(n_bins <= max_bins_per_interval),
            df.filter(n_bins > max_bins_per_interval),
        )

    lnarrow, lwide = split(lv, ls, le)
    rnarrow, rwide = split(rv, rs, re_)

    lex = lnarrow.withColumn("__sbin_l", _bin(ls, bin_width)).withColumn(
        "__bin", F.explode(F.sequence(_bin(ls, bin_width), _bin(le, bin_width)))
    )
    rex = rnarrow.withColumn("__sbin_r", _bin(rs, bin_width)).withColumn(
        "__bin", F.explode(F.sequence(_bin(rs, bin_width), _bin(re_, bin_width)))
    )
    out = (
        lex.join(rex, on="__bin", how="inner")
        .filter(F.col("__bin") == F.greatest("__sbin_l", "__sbin_r"))
        .filter(overlap)
        .drop("__bin", "__sbin_l", "__sbin_r")
    )
    # wide remainders are tiny by construction -> broadcast NLJ legs;
    # lwide x rv covers wide-wide pairs, so the rwide leg only sees the
    # narrow left side (no pair counted twice)
    if lwide is not None:
        out = out.unionByName(rv.join(F.broadcast(lwide), on=[overlap]))
    if rwide is not None:
        out = out.unionByName(lnarrow.join(F.broadcast(rwide), on=[overlap]))
    return out
