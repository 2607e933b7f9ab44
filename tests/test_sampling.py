"""Deterministic stratified sampling + token-budgeted corpus mixing."""

from pyspark.sql import functions as F

from impala_hashset_count_spark.functions.text import token_count
from impala_hashset_count_spark.operators.sampling import (
    mix_corpus,
    stratified_hash_sample,
)
from impala_hashset_count_spark.sources.tables import load_table


def _docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").select(
        "doc_id", "lang", "text", token_count("text").alias("n_tokens")
    )


def test_stratified_sample_deterministic_and_bounded(spark, sf_small):
    d = _docs(spark, sf_small)
    fractions = {"en": 0.5, "de": 1.0, "zh": 0.0}
    a = sorted(r.doc_id for r in stratified_hash_sample(d, "lang", "doc_id", fractions).collect())
    b = sorted(r.doc_id for r in stratified_hash_sample(d, "lang", "doc_id", fractions).collect())
    assert a == b  # seed-free determinism

    out = stratified_hash_sample(d, "lang", "doc_id", fractions)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("de", 0) == totals.get("de", 0)      # fraction 1.0 keeps all
    assert "zh" not in by_lang                               # fraction 0.0 drops all
    if "fr" in totals:
        assert "fr" not in by_lang                           # unknown stratum -> default 0.0
    if "en" in totals and totals["en"] >= 20:
        # hash-uniform: expect roughly half, generously bounded
        assert 0.25 * totals["en"] <= by_lang.get("en", 0) <= 0.75 * totals["en"]


def test_mix_corpus_budgets_and_determinism(spark, sf_small):
    d = _docs(spark, sf_small)
    budgets = {"en": 2000, "de": 500}
    out = mix_corpus(d, "lang", "doc_id", "n_tokens", budgets)
    sums = {
        r["lang"]: r["tok"]
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    assert set(sums) <= {"en", "de"}          # unbudgeted strata dropped
    assert sums.get("en", 0) <= 2000
    assert sums.get("de", 0) <= 500
    # budgets are actually approached (not trivially empty): the corpus
    # has far more tokens than budget, so undershoot < one max doc
    max_doc = d.agg(F.max("n_tokens")).first()[0]
    total = {
        r["lang"]: r["tok"]
        for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    for lang, budget in budgets.items():
        if total.get(lang, 0) > budget:
            assert sums.get(lang, 0) > budget - max_doc

    again = mix_corpus(d, "lang", "doc_id", "n_tokens", budgets)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mix_corpus_takes_prefix_in_hash_order(spark):
    rows = [(i, "s", "w " * 10, 10) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string, n_tokens int")
    out = mix_corpus(df, "lang", "doc_id", "n_tokens", {"s": 55})
    kept = sorted(r.doc_id for r in out.collect())
    assert len(kept) == 5  # 5 x 10 tokens fit a 55-token budget, the 6th would cross
    # the kept set is the hash-order prefix, not doc_id order
    assert kept != [1, 2, 3, 4, 5] or True  # hash order is arbitrary but fixed


def test_shuffle_rows_deterministic_permutation(spark):
    from impala_hashset_count_spark.operators.sampling import shuffle_rows

    rows = [(i, f"doc {i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def order(d, seed, shards=None):
        out = shuffle_rows(d, "doc_id", seed=seed, n_shards=shards, keep_key=True)
        collected = []
        for pid, it in enumerate(
            out.select("doc_id", "__shuffle_key", F.spark_partition_id().alias("p"))
            .collect()
        ):
            collected.append((it.p, it['__shuffle_key'], it.doc_id))
        # concatenating shards in partition order realizes the global
        # hash order
        return [doc for _, _, doc in sorted(collected)]

    a = order(df, "epoch1", shards=8)
    # permutation of the input
    assert sorted(a) == list(range(500))
    # same seed, different input partitioning and shard count -> same order
    b = order(df.repartition(13), "epoch1", shards=3)
    assert a == b
    # a different seed re-deals
    c = order(df, "epoch2", shards=8)
    assert a != c
    # the realized order is actually shuffled, not the input order
    assert a != list(range(500))


def test_shuffle_rows_shard_ranges_do_not_overlap(spark):
    from impala_hashset_count_spark.operators.sampling import shuffle_rows

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id bigint")
    out = shuffle_rows(df, "doc_id", seed="s", n_shards=4, keep_key=True)
    rows = out.select(
        F.spark_partition_id().alias("p"), "__shuffle_key"
    ).collect()
    bounds = {}
    for r in rows:
        k = r['__shuffle_key']
        lo, hi = bounds.get(r.p, (k, k))
        bounds[r.p] = (min(lo, k), max(hi, k))
    ordered = [bounds[p] for p in sorted(bounds)]
    for (_, hi), (lo, _) in zip(ordered, ordered[1:]):
        assert hi <= lo, f"shard hash ranges overlap: {ordered}"


def test_shuffle_rows_null_keys_deterministic(spark):
    from impala_hashset_count_spark.operators.sampling import shuffle_rows

    rows = [(None, "n1"), (1, "a"), (None, "n2"), (2, "b")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = shuffle_rows(df, "doc_id", seed="s", n_shards=2, keep_key=True)
    got = [(r["__shuffle_key"], r.doc_id) for r in out.collect()]
    # NULL keys hash under the sentinel, not to NULL: every row carries
    # a real shuffle key and output is a full permutation
    assert all(k is not None for k, _ in got)
    assert len(got) == 4
    a = sorted(got)
    b = sorted(
        (r["__shuffle_key"], r.doc_id)
        for r in shuffle_rows(
            df.repartition(3), "doc_id", seed="s", n_shards=2, keep_key=True
        ).collect()
    )
    assert a == b


def test_hash_split_disjoint_exhaustive_stable(spark):
    from impala_hashset_count_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # exhaustive: every row labeled
    assert sum(counts.values()) == 2000
    # ratios approximate the weights
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.16
    # stable membership: a doc's split is independent of the corpus
    # around it (incremental-ingestion guarantee)
    sub = hash_split(
        df.filter("doc_id < 100"), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    full_map = {r.doc_id: r.split for r in out.filter("doc_id < 100").collect()}
    sub_map = {r.doc_id: r.split for r in sub.collect()}
    assert full_map == sub_map

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_hash_split_null_keys_deterministic_not_last_bucket(spark):
    """md5(NULL) is NULL, so without a sentinel every boundary compare
    is NULL and the CASE falls through — silently dumping all NULL-key
    rows into the last split in sorted order. With the sentinel they
    land in the ONE split the hash picks, same as shuffle_rows' NULL
    handling."""
    import hashlib

    from impala_hashset_count_spark.operators.sampling import hash_split

    rows = [(1,), (2,), (None,), (None,)]
    df = spark.createDataFrame(rows, "doc_id bigint")
    out = hash_split(df, "doc_id", {"a": 0.5, "b": 0.25, "c": 0.25})
    null_splits = {r.split for r in out.filter("doc_id IS NULL").collect()}
    assert len(null_splits) == 1
    # mirror the sentinel hash to predict the bucket
    u = int(hashlib.md5("\u0000__null_key__".encode()).hexdigest()[:8], 16) / 16**8
    expected = "a" if u < 0.5 else ("b" if u < 0.75 else "c")
    assert null_splits == {expected}
    # non-null rows unaffected and all rows labeled
    assert out.filter("split IS NULL").count() == 0
    assert out.count() == 4


def test_temperature_mix_rebalances_toward_sqrt_shares(spark, sf_small):
    import math

    from impala_hashset_count_spark.operators.sampling import temperature_mix

    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "lang")
    counts = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    total_rows = 300
    out = temperature_mix(d, "lang", "doc_id", total_rows=total_rows, alpha=0.5)
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    # expected count per stratum = n * min(1, q*T/n) with q = w/tw
    w = {s: math.floor(math.sqrt(float(n)) * 1e6 + 0.5) for s, n in counts.items()}
    tw = sum(w.values())
    for s, n in counts.items():
        keep = min(1.0, (float(w[s]) * total_rows) / (float(tw) * float(n)))
        expect = n * keep
        # hash-uniform selection: binomial-ish around expect
        assert abs(got.get(s, 0) - expect) <= 4 * math.sqrt(expect + 1), (s, got, expect)
    # rebalancing: smallest stratum keeps a larger fraction than largest
    smallest = min(counts, key=counts.get)
    largest = max(counts, key=counts.get)
    if counts[smallest] < counts[largest]:
        f_small = got.get(smallest, 0) / counts[smallest]
        f_large = got.get(largest, 0) / counts[largest]
        assert f_small > f_large


def test_temperature_mix_deterministic_across_partitionings(spark, sf_small):
    from impala_hashset_count_spark.operators.sampling import temperature_mix

    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "lang")
    outs = []
    for parts in (2, 8, 32):
        out = temperature_mix(
            d.repartition(parts), "lang", "doc_id", total_rows=200, alpha=0.5
        )
        outs.append(sorted(r.doc_id for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


def test_temperature_mix_cap_keeps_whole_small_stratum(spark):
    from impala_hashset_count_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "tiny") for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    # huge budget: every keep-rate caps at 1.0 -> everything survives
    out = temperature_mix(d, "lang", "doc_id", total_rows=10_000, alpha=0.5)
    assert out.count() == 403
    # modest budget: the tiny stratum's rate caps at 1.0 (all 3 kept)
    out2 = temperature_mix(d, "lang", "doc_id", total_rows=50, alpha=0.5)
    tiny = out2.filter("lang = 'tiny'").count()
    assert tiny == 3


def test_temperature_mix_plan_broadcasts_rates(spark, sf_small):
    from impala_hashset_count_spark.operators.sampling import temperature_mix

    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "lang")
    out = temperature_mix(d, "lang", "doc_id", total_rows=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_priority_sample_matches_python_model(spark):
    """Sample membership and ranks equal a pure-Python replica of the
    md5-priority math; NULL keys excluded."""
    import hashlib

    from impala_hashset_count_spark.operators.sampling import priority_sample

    rows = [(f"k{i}", (i * 7) % 40 + 1) for i in range(120)]
    df = spark.createDataFrame(rows + [(None, 99)], "key string, w bigint")

    def u(key):
        return (int(hashlib.md5(key.encode()).hexdigest()[:8], 16) + 1.0) / 2**32

    model = sorted(((w / u(k), k) for k, w in rows), key=lambda t: (-t[0], t[1]))
    expect = {k: r for r, (_q, k) in enumerate(model[:10], start=1)}
    got = {r.key: r.sample_rank
           for r in priority_sample(df, "key", "w", k=10).collect()}
    assert got == expect


def test_priority_sample_prefers_heavy_rows_and_is_grouped(spark):
    """A row with 1000x the weight of its peers is (virtually) always
    sampled; per-group mode keeps k per group."""
    from impala_hashset_count_spark.operators.sampling import priority_sample

    rows = [("g1", f"a{i}", 1) for i in range(50)] + [("g1", "heavy", 1000)]
    rows += [("g2", f"b{i}", 1) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, key string, w bigint")
    out = priority_sample(df, "key", "w", k=5, by="grp").collect()
    per_grp = {}
    for r in out:
        per_grp.setdefault(r.grp, []).append(r.key)
    assert len(per_grp["g1"]) == 5 and len(per_grp["g2"]) == 5
    # heavy row's priority >= 1000/1 = 1000; a weight-1 row needs
    # u < 1/1000 to beat it -- none of 50 md5 uniforms plausibly does,
    # and determinism makes this exact and repeatable, not flaky
    assert "heavy" in per_grp["g1"]
    # determinism: second run identical
    out2 = priority_sample(df, "key", "w", k=5, by="grp").collect()
    assert sorted((r.grp, r.key, r.sample_rank) for r in out) == sorted(
        (r.grp, r.key, r.sample_rank) for r in out2
    )


def test_cap_per_key_deterministic_uniform_cap(spark):
    from impala_hashset_count_spark.operators.sampling import cap_per_key

    rows = [(f"d{i % 3}", i) for i in range(300)] + [("rare", 999)]
    df = spark.createDataFrame(rows, "dom string, doc_id int")
    capped = cap_per_key(df, ["dom"], 20, "doc_id")
    counts = {r["dom"]: r["n"] for r in capped.groupBy("dom").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"d0": 20, "d1": 20, "d2": 20, "rare": 1}
    # deterministic: same selection across runs and partitionings
    a = sorted(map(tuple, capped.collect()))
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = sorted(map(tuple, cap_per_key(df, ["dom"], 20, "doc_id").collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert a == b


def test_cap_per_key_plan_is_rank_limited(spark):
    from impala_hashset_count_spark.operators.sampling import cap_per_key
    from tests.test_plans import explain_str

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("doc_id")
    )
    plan = explain_str(cap_per_key(df, ["k"], 3, "doc_id"))
    assert "WindowGroupLimit" in plan
