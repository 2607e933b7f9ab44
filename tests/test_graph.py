"""Graph stats: degrees, exact triangle enumeration (K4, chains,
random-vs-brute-force), and hub-skew orientation sanity."""

import itertools
import random

from impala_hashset_count_spark.operators.graph import (
    degrees,
    triangle_counts,
    triangles,
)

SCHEMA = "id_1 long, id_2 long"


def _df(spark, edges):
    return spark.createDataFrame(sorted(set(edges)), SCHEMA)


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    out = set()
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            out.add((a, b, c))
    return out


def test_k4_and_chain(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    tri = sorted(map(tuple, triangles(_df(spark, k4)).collect()))
    assert tri == sorted(_brute_triangles(k4))
    assert len(tri) == 4
    per_node = {r["id"]: r["n_triangles"] for r in triangle_counts(_df(spark, k4)).collect()}
    assert per_node == {0: 3, 1: 3, 2: 3, 3: 3}
    chain = [(0, 1), (1, 2), (2, 3)]
    assert triangles(_df(spark, chain)).count() == 0


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(5)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    got = sorted(map(tuple, triangles(_df(spark, edges)).collect()))
    assert got == sorted(_brute_triangles(edges))
    brute_pernode = {}
    for t in _brute_triangles(edges):
        for n in t:
            brute_pernode[n] = brute_pernode.get(n, 0) + 1
    per_node = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(_df(spark, edges)).collect()
    }
    assert per_node == brute_pernode


def test_hub_star_with_skew(spark):
    """A hub star (degree 50) with one rim edge: exactly one triangle,
    found despite the hub — orientation sends wedge work to the
    low-degree rim nodes."""
    star = [(100, i) for i in range(50)]
    star.append((0, 1))
    tri = sorted(map(tuple, triangles(_df(spark, star)).collect()))
    assert tri == [(0, 1, 100)]


def test_degrees(spark):
    deg = {
        r["id"]: r["degree"]
        for r in degrees(_df(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])).collect()
    }
    assert deg == {0: 2, 1: 2, 2: 3, 3: 1}


def _pagerank_model(edges, iters=3, scale=10**12):
    """Pure-Python fixed-point PageRank model (same integer recurrence
    as pagerank_fixed): edges = undirected (a, b) pairs."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    deg = {v: len(ns) for v, ns in adj.items()}
    r = {v: scale // n for v in adj}
    for _ in range(iters):
        contrib = {v: 0 for v in adj}
        for v, ns in adj.items():
            share = r[v] // deg[v]
            for u in ns:
                contrib[u] += share
        r = {v: (15 * scale) // (100 * n) + (85 * contrib[v]) // 100 for v in adj}
    return r


def test_pagerank_fixed_matches_python_model(spark):
    from impala_hashset_count_spark.operators.graph import pagerank_fixed

    import random

    rng = random.Random(7)
    nodes = list(range(1, 31))
    edges = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)}
    df = spark.createDataFrame(sorted(edges), "id_1 bigint, id_2 bigint")
    got = {r.id: r.pr_fixed for r in pagerank_fixed(df, iters=3).collect()}
    assert got == _pagerank_model(edges, iters=3)


def test_pagerank_fixed_hub_star_and_symmetry(spark):
    """A hub with 10 leaves: the hub outranks every leaf; all leaves
    (symmetric) have IDENTICAL fixed-point ranks — no float noise."""
    from impala_hashset_count_spark.operators.graph import pagerank_fixed

    edges = [(0, i) for i in range(1, 11)]
    df = spark.createDataFrame(edges, "id_1 bigint, id_2 bigint")
    got = {r.id: r.pr_fixed for r in pagerank_fixed(df, iters=3).collect()}
    leaf_ranks = {got[i] for i in range(1, 11)}
    assert len(leaf_ranks) == 1
    assert got[0] > leaf_ranks.pop()
    assert got == _pagerank_model(edges, iters=3)


def test_pagerank_fixed_partition_sweep_bit_identical(spark):
    """The integer recurrence is summation-order-independent: identical
    BIGINT output at 2 and 32 shuffle partitions."""
    from impala_hashset_count_spark.operators.graph import pagerank_fixed

    edges = [(i, (i * 3 + 1) % 20) for i in range(20) if i != (i * 3 + 1) % 20]
    edges = sorted({tuple(sorted(e)) for e in edges})
    df = spark.createDataFrame(edges, "id_1 bigint, id_2 bigint")
    results = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            results.append(sorted(
                (r.id, r.pr_fixed) for r in pagerank_fixed(df, iters=3).collect()
            ))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert results[0] == results[1]
    # conserved-ish mass: floor division only leaks, never creates
    assert sum(v for _, v in results[0]) <= 10**12


def test_pagerank_hypothesis_matches_model(spark):
    """Property-based: arbitrary small undirected graphs (no isolated
    self-loops) — pagerank_fixed equals the integer-recurrence Python
    model bit-for-bit."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge_strategy = st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=25,
    )

    @given(raw=edge_strategy)
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(raw):
        edges = sorted({tuple(sorted(e)) for e in raw})
        from impala_hashset_count_spark.operators.graph import pagerank_fixed

        df = spark.createDataFrame(edges, "id_1 bigint, id_2 bigint")
        got = {r.id: r.pr_fixed for r in pagerank_fixed(df, iters=2).collect()}
        assert got == _pagerank_model(edges, iters=2)

    check()
