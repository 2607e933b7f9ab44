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


def pagerank_fixed(
    pairs: DataFrame,
    src: str = "id_1",
    dst: str = "id_2",
    iters: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected pair graph in
    INTEGER fixed-point arithmetic — centrality for the near-dup graph
    (which node is the template everything copies) that is
    ENGINE-BIT-STABLE and therefore oracle-checkable: ranks are BIGINT
    micro-units (``scale`` = 1.0), every step is integer division and
    integer sums (order-independent), so Spark and a SQL mirror produce
    identical values regardless of partitioning or summation order —
    the same discipline corpus_stats uses for float sums.

    r_0(v) = scale // n;
    r_{t+1}(v) = (15*scale) // (100*n) + (85 * sum_{u~v} r_t(u)//deg(u)) // 100

    (damping 0.85 as the exact rational 85/100). Undirected pair edges
    mean no dangling nodes (every node has degree >= 1). The plan is
    fully declarative: the node count joins in as a broadcast 1-row
    aggregate, each iteration is one equi-join + one sum shuffle on the
    edge list — O(iters * edges), the textbook distributed shape.
    Returns (id, pr_fixed) with sum(pr_fixed) <= scale (floor division
    leaks mass deterministically; both engines replicate the leak).

    A fixed iteration count is deliberate: convergence-tested PageRank
    needs a driver-side loop test anyway, while 3 fixed iterations keep
    the whole computation one static plan AND SQL-expressible (chained
    CTEs) — on near-clique dup clusters the ranking is stable by then.
    """
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionAll(
        pairs.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select(F.col("s").alias("id"), "deg")
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = nodes.join(F.broadcast(nn)).select(
        "id", "deg", "n", F.expr(f"{scale} div n").alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                r.select(F.col("id").alias("s"), F.expr("pr div deg").alias("c")),
                "s",
            )
            .groupBy("d")
            .agg(F.sum("c").alias("csum"))
        )
        r = (
            nodes.join(F.broadcast(nn))
            .join(contrib.select(F.col("d").alias("id"), "csum"), "id", "left")
            .select(
                "id",
                "deg",
                "n",
                (
                    F.expr(f"{15 * scale} div (100 * n)")
                    + F.expr("(85 * coalesce(csum, 0)) div 100")
                ).alias("pr"),
            )
        )
    return r.select("id", F.col("pr").cast("long").alias("pr_fixed"))


def pagerank_oracle_ctes(iters: int = 3, scale: int = 10**12) -> str:
    """Generate the DuckDB CTE chain mirroring ``pagerank_fixed``
    term-for-term, against pre-existing ``edges(src, dst)`` and
    ``deg(id, degree)`` CTEs. Emits ``pr{iters}(id, pr)``."""
    parts = [
        f"pn AS (SELECT COUNT(*) AS n FROM deg),\n"
        f"    pr0 AS (SELECT d.id, {scale} // pn.n AS pr FROM deg d, pn)"
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""pc{t} AS (
        SELECT e.dst AS id, SUM(pr.pr // dg.degree) AS csum
        FROM edges e
        JOIN pr{t - 1} pr ON e.src = pr.id
        JOIN deg dg ON e.src = dg.id
        GROUP BY e.dst
    ),
    pr{t} AS (
        SELECT d.id,
               {15 * scale} // (100 * pn.n)
               + (85 * COALESCE(c.csum, 0)) // 100 AS pr
        FROM deg d CROSS JOIN pn LEFT JOIN pc{t} c ON d.id = c.id
    )"""
        )
    return ",\n    ".join(parts)
