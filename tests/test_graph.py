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
