"""Deterministic sampling & corpus mixing for training-data pipelines.

Both operators are seed-free and engine-reproducible: the randomness is
a uniform value derived from a content/key hash, so re-runs, different
partitionings, and different engines select the SAME rows — the
property ``df.sample``/``sampleBy`` (RNG-seed based, partitioning-
sensitive) cannot give, and the one that matters for reproducible
training sets. Companion of the registry's ``sample_hash_documents``
(plain hash sampling); these add per-stratum control:

- ``stratified_hash_sample`` — per-stratum KEEP FRACTIONS (e.g. keep 10%
  of 'en', 50% of 'de'): pure filter, zero shuffle, scales with the
  scan.
- ``mix_corpus`` — per-stratum TOKEN BUDGETS (the "data mixture" step:
  so-many tokens of each language/source, chosen deterministically):
  one window shuffle on the stratum key; rows are taken in
  content-hash order until each stratum's cumulative token budget is
  reached.

Scale note (100 TB): ``mix_corpus``'s window partitions by stratum —
with few huge strata, add a coarse salt to the ordering hash and take
per-salt sub-budgets, or pre-filter with ``stratified_hash_sample`` at
an over-estimate of the keep rate and budget-trim the small remainder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _uniform_from_hash(key: Column) -> Column:
    """Deterministic uniform in [0, 1) from a key: first 8 hex digits of
    md5 over 16^8. Mirrors as SQL for any engine with md5+conv."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(16**8))
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash-uniform u(key) < fraction(stratum).

    Strata absent from ``fractions`` fall back to ``default_fraction``
    (0.0 = drop unknown strata, the safe curation default). Pure
    column filter — no shuffle, no seed state, no extra pass."""
    pairs: list[Column] = []
    for stratum, frac in sorted(fractions.items()):
        pairs.extend([F.lit(stratum), F.lit(float(frac))])
    frac_map = F.create_map(*pairs)
    u = _uniform_from_hash(F.col(key_col))
    frac = F.coalesce(
        frac_map.getItem(F.col(strata_col)), F.lit(float(default_fraction))
    )
    return df.filter(u < frac)


def mix_corpus(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Deterministic token-budgeted mixture: per stratum, rows are
    ordered by content-hash (uniform, reproducible) and kept while the
    running token total stays within the stratum's budget; the first
    row that would cross the budget — and everything after it — is
    dropped. Strata without a budget are dropped entirely.

    Result: ~budget tokens per stratum (undershoot < one max document),
    identical on every run and engine. One shuffle (the per-stratum
    window)."""
    pairs: list[Column] = []
    for stratum, budget in sorted(budgets.items()):
        pairs.extend([F.lit(stratum), F.lit(int(budget)).cast("long")])
    budget_map = F.create_map(*pairs)
    order = _uniform_from_hash(F.col(key_col))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    budget = budget_map.getItem(F.col(strata_col))
    return (
        df.withColumn("__cum_tokens", cum)
        .filter(budget.isNotNull() & (F.col("__cum_tokens") <= budget))
        .drop("__cum_tokens")
    )


def shuffle_rows(
    df: DataFrame,
    key_col: str,
    seed: str = "",
    n_shards: int | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Deterministic global pseudo-random ordering — the final
    "shuffle the training data" step before sequences are served.

    Rows are totally ordered by ``md5(seed || key)``: the same seed
    reproduces the identical order on ANY input partitioning or engine
    (unlike ``df.orderBy(rand(seed))``, whose RNG stream is
    partitioning-dependent), and a new seed re-deals the order for the
    next epoch. The order is realized scalably: ``repartitionByRange``
    on the hash (range boundaries from a small sample, no single-node
    sort) + ``sortWithinPartitions`` — shard i holds a contiguous hash
    range, so concatenating shards in partition order IS the global
    order; at 100 TB that is exactly the write-sharded layout a data
    loader streams sequentially.

    ``key_col`` must be UNIQUE per row (a doc/sequence id) — that is
    what makes the order total; rows sharing a key get identical
    shuffle keys and sort adjacently with their relative order defined
    only by the key tie-break, and NULL keys are hashed under a
    sentinel (they land at one deterministic position instead of
    clumping unshuffled).

    ``n_shards`` sizes the output (default: session shuffle
    parallelism). ``keep_key`` retains the ``__shuffle_key`` column for
    downstream order verification."""
    key_str = F.coalesce(
        F.col(key_col).cast("string"), F.lit("\u0000__null_key__")
    )
    keyed = df.withColumn(
        "__shuffle_key", F.md5(F.concat(F.lit(str(seed)), key_str))
    )
    parts = (
        keyed.repartitionByRange(n_shards, "__shuffle_key")
        if n_shards
        else keyed.repartitionByRange("__shuffle_key")
    )
    # secondary sort on the key itself: deterministic order even when
    # distinct keys ever collide in md5 (and a stable adjacency rule
    # for duplicate keys)
    out = parts.sortWithinPartitions("__shuffle_key", key_col)
    return out if keep_key else out.drop("__shuffle_key")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: each row gets a split label
    from the hash-uniform of its key against cumulative weight
    boundaries — disjoint, exhaustive, reproducible on any
    partitioning/engine (``df.randomSplit`` is neither reproducible
    across partitionings nor disjoint-by-key), and a document keeps its
    split when the corpus around it changes (stable membership under
    incremental ingestion). Zero shuffle: one codegen'd CASE per row.

    ``weights`` must sum to ~1 (validated); iteration order is sorted
    by name for determinism. Rows sharing a key share a split —
    deliberate (split leakage guard: all chunks of one doc land on the
    same side). NULL keys hash under the same sentinel ``shuffle_rows``
    uses — they all land in ONE deterministic split chosen by the hash
    (without the coalesce, ``md5(NULL)`` is NULL, every boundary
    comparison is NULL, and the CASE would silently dump every NULL-key
    row into the last split, breaking the hash-uniform contract)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = _uniform_from_hash(
        F.coalesce(F.col(key_col).cast("string"), F.lit("\u0000__null_key__"))
    )
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    total_rows: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based source/language rebalancing — the standard
    multilingual-LLM mixture: stratum s with n_s rows gets mixture
    share q_s ∝ n_s^alpha (alpha < 1 upweights low-resource strata),
    realized as a per-stratum keep-rate ``min(1, q_s * total_rows /
    n_s)`` over the same seed-free hash-uniform used by the other
    samplers, so the selection is reproducible across runs,
    partitionings, and engines. Rates > 1 are capped (sampling without
    replacement cannot oversample; repeat-epoch oversampling is the
    data loader's job).

    Fully declarative — no driver collect: one small stratum-count
    aggregation, a 1-row total broadcast, and a broadcast rate join
    onto the corpus scan (two corpus passes total; at 100 TB the count
    pass is a cheap single-column scan, or feed pre-known counts via a
    materialized stats table upstream).

    Engine-stable math: alpha=0.5 uses ``sqrt`` (correctly rounded per
    IEEE-754, unlike ``pow``), each weight is quantized to integer
    micro-units and summed as BIGINT (order-independent), and the rate
    is a single fixed-association double expression — the same
    discipline as ``corpus_stats._qint``. Non-0.5 alphas are supported
    for API users via ``pow`` but are not oracle-mirrorable bit-exactly."""
    if alpha == 0.5:
        w_raw = F.sqrt(F.col("__n").cast("double"))
    else:
        w_raw = F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    weights = counts.withColumn(
        "__w", F.floor(w_raw * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    )
    total = weights.agg(F.sum("__w").alias("__tw"))
    rates = weights.crossJoin(F.broadcast(total)).select(
        strata_col,
        F.least(
            F.lit(1.0),
            (F.col("__w").cast("double") * F.lit(float(total_rows)))
            / (F.col("__tw").cast("double") * F.col("__n").cast("double")),
        ).alias("__keep"),
    )
    u = _uniform_from_hash(F.col(key_col))
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(u < F.col("__keep"))
        .drop("__keep")
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    k: int,
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — PRIORITY
    SAMPLING (Duffield-Lund-Thorup): each row gets priority
    ``q = w / u`` where ``u`` is the content-fixed md5 uniform of its
    key, and the ``k`` highest-priority rows are kept (per ``by`` group
    if given). Heavier rows are proportionally likelier to be sampled;
    the same data always yields the same sample (no seed state across
    executors, stable under re-runs and engines — the weighted
    counterpart of ``stratified_hash_sample``).

    For unbiased totals, downstream estimators use
    ``w_hat = max(w, tau)`` with ``tau`` = the (k+1)-th priority; this
    function returns the sample with its priorities so callers can
    derive ``tau`` from rank k+1 if they keep it (pass k+1 and drop the
    last row after reading its q).

    Engine-bit-stable by construction: ``u = (h64 + 1) / 2^32`` where
    h64 is the 32-bit md5 prefix — an exact integer divided by a power
    of two is EXACT in binary floating point, so ``q = w / u`` is one
    IEEE division of exact operands; ranking is a total order on
    (q DESC, key). One window shuffle, WindowGroupLimit-bounded when
    ``by`` is given; the global case is a rank window over one column.
    NULL keys are excluded (no stable identity to hash)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.col(key_col)
    u = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**32))
    q = (w.cast("double") / u).alias("priority")
    win = (
        Window.partitionBy(by).orderBy(F.desc("priority"), key)
        if by is not None
        else Window.orderBy(F.desc("priority"), key)
    )
    return (
        df.filter(key.isNotNull())
        .withColumn("priority", q)
        .withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
    )


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    max_rows: int,
    id_col: str,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per key, chosen DETERMINISTICALLY
    in content-hash order of ``id_col`` — the per-domain crawl cap
    (with ``key_cols=[reg_domain]`` from ``functions.text.url_features``
    this is the "no domain may dominate the corpus" policy), and the
    same bounded-representation tool for any over-represented source.

    Hash order rather than an attribute order keeps the selection
    seed-free and engine-stable (the ``_uniform_from_hash`` discipline
    above), and unbiased within the key: the kept subset is a uniform
    sample of the key's rows, not its first or newest ones. Plan shape:
    one window shuffle on the key; ``row_number <= k`` is rank-limited
    map-side by WindowGroupLimit, so the shuffle carries at most
    ``max_rows`` rows per key per input partition — the same top-k
    physics as ``topk_per_customer_and_global``."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_rows))
        .drop("__rn")
    )
