"""Declarative data-quality constraint checks — one aggregate pass.

`operators/profile.py` answers "what does this table look like"; this
module answers "does it satisfy the contract": the Deequ/
Great-Expectations-style verification suite a 100 TB ingestion pipeline
runs on every landed batch before downstream jobs consume it.

Every row-level constraint compiles to a violation-COUNT aggregate
expression, so an arbitrary suite of N constraints is ONE aggregate
over ONE scan (no per-constraint jobs). Uniqueness rides the same
pass: duplicate-row surplus = ``COUNT(keys) - COUNT(DISTINCT keys)``,
which Catalyst folds into the same Expand-based multi-distinct
aggregate the reference UDA exists to serve
(`/root/reference/README.md:1-10`). Referential integrity is the one
constraint that genuinely needs a second relation: a broadcast
LEFT ANTI count against the parent key set (the child table is scanned
once and never shuffled when the parent side broadcasts).

All outputs are integer counts and booleans — engine-bit-stable by
construction, so the whole surface sits under the DuckDB hash oracle.

Semantics: NULL never violates a value constraint (SQL three-valued
logic — pair with ``not_null`` to forbid NULLs); ``unique`` counts the
surplus rows beyond the first of each duplicate key group; a NULL
child key never violates the foreign key (SQL FK semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[str, Column]


def _violations(name: str, violated: Column) -> Check:
    return (name, F.count(F.when(violated, F.lit(1))).cast("long"))


def not_null(col: str) -> Check:
    return _violations(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return _violations(f"in_range:{col}", (c < F.lit(lo)) | (c > F.lit(hi)))


def in_set(col: str, values: list) -> Check:
    c = F.col(col)
    return _violations(f"in_set:{col}", c.isNotNull() & ~c.isin(values))


def matches(col: str, pattern: str) -> Check:
    """Keep ``pattern`` in the RE2∩Java-portable subset (see
    `tests/test_pii_repetition.py` for the repo's portability tests)."""
    c = F.col(col)
    return _violations(f"matches:{col}", c.isNotNull() & ~c.rlike(pattern))


def satisfies(name: str, predicate: Column) -> Check:
    """Arbitrary row predicate that must hold; NULL predicate rows do
    not violate (three-valued logic, as in SQL CHECK constraints)."""
    return _violations(f"satisfies:{name}", ~F.coalesce(predicate, F.lit(True)))


def unique(cols: list[str]) -> Check:
    """Duplicate surplus: rows beyond the first of each key group.
    Multi-column keys count NULL-containing keys too (struct equality),
    matching ``GROUP BY`` semantics."""
    key = F.struct(*[F.col(c) for c in cols]) if len(cols) > 1 else F.col(cols[0])
    name = f"unique:{','.join(cols)}"
    return (name, (F.count(key) - F.count_distinct(key)).cast("long"))


def check_constraints(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the suite in ONE aggregate. Returns long form:
    (constraint, n_rows, n_violations, passed) — one row per check."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        expr.alias(f"__v{i}") for i, (_, expr) in enumerate(checks)
    ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.col("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return one.select(F.inline(entries))


def check_foreign_key(
    child: DataFrame,
    parent: DataFrame,
    child_cols: list[str],
    parent_cols: list[str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential integrity: count child rows whose (non-NULL) key has
    no match in the parent key set. Same long-form schema as
    ``check_constraints`` so suites union cleanly. The parent side is
    reduced to its distinct key set and broadcast — the child never
    shuffles (pass ``False`` when the parent key set is itself huge)."""
    keys = parent.selectExpr(
        *[f"{p} AS {c}" for c, p in zip(child_cols, parent_cols)]
    ).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    nonnull = child
    for c in child_cols:
        nonnull = nonnull.filter(F.col(c).isNotNull())
    orphans = nonnull.join(keys, on=child_cols, how="left_anti")
    name = f"foreign_key:{','.join(child_cols)}"
    return child.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).crossJoin(
        orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    ).select(
        F.lit(name).alias("constraint"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def observe_constraints(df: DataFrame, checks: list[Check], name: str = "checks"):
    """ZERO-EXTRA-PASS verification: attach the suite as a Spark
    ``Observation`` so the violation counts are collected as metrics
    DURING whatever action the caller runs on the returned DataFrame —
    the production shape for "validate every batch you were going to
    write anyway" (check_constraints is the standalone one-aggregate
    face; this one costs nothing beyond the job the data already
    pays for).

    Returns (observed_df, observation). After ANY action on
    observed_df (count/write/collect), ``observation.get`` is a dict
    {"n_rows": ..., "<constraint>": violation_count, ...}. Works in
    Structured Streaming too (df.observe is streaming-legal; metrics
    surface per micro-batch via QueryProgress — the batch face here
    uses the blocking Observation helper)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        expr.alias(cname) for cname, expr in checks
    ]
    return df.observe(obs, *metrics), obs
