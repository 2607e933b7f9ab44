"""Graph statistics over a pair list: degrees and triangle counts.

The dedup pipeline materializes a near-dup PAIR GRAPH
(`operators/dedup.py` — exact Jaccard or MinHash-LSH edges) and takes
its transitive closure for dedup policy; this module adds the graph
measurements a corpus curator reads off that graph: per-node degree
(how promiscuous is a template/boilerplate document) and triangle
participation (near-dup clusters are near-cliques, so triangle density
separates true duplicate clusters from chain-shaped false-positive
bridges — a chain A~B~C with no A~C edge closes no triangle).

Triangle counting is the textbook skew-sensitive distributed problem:
enumerating wedges at a hub of degree d costs O(d^2). The standard fix
(Schank's forward algorithm / "degree orientation") is implemented
here declaratively: impose the total order pi = (degree, id) and
orient every undirected edge from the pi-smaller to the pi-larger
endpoint. Every triangle then has exactly ONE source node with two
outgoing oriented edges, so it is found exactly once by

    wedge:  o1(u -> v), o2(u -> w), pi(v) < pi(w)
    close:  oriented edge (v -> w) exists

and — the scale property — out-degrees under pi-orientation are
bounded by O(sqrt(m)), so wedge fan-out is O(m^1.5) total regardless
of hub skew, versus O(sum d^2) unoriented. Three shuffles (degree agg,
wedge join, closing join), all equi-joins; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(pairs: DataFrame, src: str = "id_1", dst: str = "id_2") -> DataFrame:
    """Per-node degree of the undirected pair graph (one row per
    distinct endpoint; pairs must be unique undirected edges, e.g. the
    ``id_1 < id_2`` form the dedup tiers emit)."""
    ends = pairs.select(F.col(src).alias("id")).unionAll(
        pairs.select(F.col(dst).alias("id"))
    )
    return ends.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("degree"))


def _oriented(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient each undirected edge by pi = (degree, id): u -> v with
    pi(u) < pi(v). Emits (u, v, du, dv) where d* are pi-degrees."""
    deg = degrees(pairs, src, dst)
    e = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .join(deg.select(F.col("id").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("degree").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def triangles(pairs: DataFrame, src: str = "id_1", dst: str = "id_2") -> DataFrame:
    """All triangles of the pair graph, one row each: (t_a, t_b, t_c)
    with ``t_a < t_b < t_c`` (plain id order, orientation-independent
    output)."""
    o = _oriented(pairs, src, dst)
    o1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1"))
    o2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2"))
    # wedges at the pi-minimal vertex, each unordered {v1,v2} once
    wedges = o1.join(o2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"], "inner")
    ids = F.array_sort(F.array("u", "v1", "v2"))
    return tri.select(
        ids[0].alias("t_a"), ids[1].alias("t_b"), ids[2].alias("t_c")
    )


def triangle_counts(
    pairs: DataFrame, src: str = "id_1", dst: str = "id_2"
) -> DataFrame:
    """Per-node triangle participation: (id, n_triangles) for every
    node in >=1 triangle. Global count = sum / 3."""
    tri = triangles(pairs, src, dst)
    member = (
        tri.select(F.col("t_a").alias("id"))
        .unionAll(tri.select(F.col("t_b").alias("id")))
        .unionAll(tri.select(F.col("t_c").alias("id")))
    )
    return member.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
