#!/usr/bin/env python
"""Scale the driver's sf0.1 testdata 10x into a local sf1 directory —
the volume-stress dataset the round-4 verdict asked for (VERDICT.md
"Next round" #1). NOT driver data: the driver's sf0.001/0.01/0.1 stay
the correctness/bench surfaces; sf1 exists to observe the scale guards
firing and to check bench scaling under real volume.

Construction (seedless, deterministic): 10 key-offset copies of every
scaled table, built so per-query WORK scales LINEARLY (the property
"no query >2x its linear-scaled sf0.1 floor" presumes):

- region/nation: fixed dimensions, copied as-is (TPC-H convention).
- customer/supplier/part/orders/lineitem/events/embeddings/documents:
  copy i offsets every key column by i * (max_key + 1), so referential
  integrity holds within each copy and group counts grow 10x with
  per-group sizes preserved.
- timestamps shift by i * (span + 1 day): copies do NOT overlap in
  time, so temporal joins (range/interval/as-of/windows) keep their
  per-row match density instead of exploding quadratically.
- document TEXT gets a per-copy suffix on EVERY token ("wx{i}"): each
  copy keeps the original's internal near-dup structure but shares no
  shingles across copies — near-dup pair counts scale linearly, the
  vocabulary grows 10x (df/idf tables really get bigger), and exact
  dedup still finds the within-copy duplicates.
- embeddings perturb by +i*1e-3 per component: cluster geometry is
  preserved per copy without cross-copy exact ties.

Usage: python tools/gen_sf1.py [dst_dir] [copies] [tables]
       (defaults: .localdata/sf1, 10, all tables;
        `tables` is a comma-separated subset — region/nation are
        always copied — for e.g. a TPC-H-only sf100)

``copies`` scales the output: 10 -> sf1 (the r5 volume surface),
100 -> sf10 (~60M lineitem rows — the second decade of the scaling
curve the r5 verdict asked for). The construction is identical at any
copy count; at 100 copies the per-copy transforms are driven by a
copy-index column (one crossJoin with ``spark.range(copies)``) so the
physical plan stays one branch instead of a 100-way union.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from impala_hashset_count_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: key -> the table that OWNS it (offset must be the owner's max+1 so
#: foreign keys stay aligned across tables)
OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def main() -> None:
    dst = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            "sf1",
        )
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    # optional 4th arg: comma-separated table subset (plus region/nation,
    # always copied) — at copies=1000 (sf100, a ~600M-row lineitem) only
    # the TPC-H-shaped tables are needed for the third-decade bench and
    # the text/embedding tables would dominate generation time and disk
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("gen-sf1")

    src = {
        t: spark.read.parquet(f"{SRC}/{t}.parquet")
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }
    for t in ("region", "nation"):
        src[t].coalesce(1).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    offsets: dict[tuple[str, str], int] = {}
    for table, col in set(OWNER.values()):
        offsets[(table, col)] = (
            src[table].agg(F.max(col).cast("long")).first()[0] + 1
        )
    spans: dict[tuple[str, str], int] = {}
    for table, cols in TS_COLS.items():
        for col in cols:
            lo, hi = src[table].agg(
                F.min(col).cast("timestamp"), F.max(col).cast("timestamp")
            ).first()
            spans[(table, col)] = int((hi - lo).total_seconds()) + 86400

    for table, key_cols in KEYS.items():
        if only is not None and table not in only:
            print(f"{table}: skipped (subset)")
            continue
        base = src[table]
        # one copy-index crossJoin drives every per-copy transform:
        # identical rows to the union-of-copies form, but the plan is
        # ONE branch — essential at 100 copies (sf10)
        # repartition BEFORE the explode: shuffling the base rows is
        # O(source), shuffling the exploded output is O(source*copies)
        # — at copies=1000 that is the difference between a 17 MB and
        # a ~20 GB exchange for the same 32-way write parallelism
        base = base.repartition(32)
        ci = F.col("__copy")
        df = base.crossJoin(
            F.broadcast(
                spark.range(copies).select(F.col("id").alias("__copy"))
            )
        )
        for kc in key_cols:
            df = df.withColumn(
                kc, F.col(kc) + ci * F.lit(offsets[OWNER[kc]])
            )
        for tc in TS_COLS.get(table, []):
            df = df.withColumn(
                tc,
                (
                    F.col(tc).cast("timestamp").cast("long")
                    + ci * F.lit(spans[(table, tc)])
                ).cast("timestamp").cast(dict(base.dtypes)[tc]),
            )
        if table == "documents":
            suffixed = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.when(w == "", w).otherwise(
                        F.concat(w, F.lit("wx"), ci.cast("string"))
                    ),
                ),
                " ",
            )
            df = df.withColumn(
                "text", F.when(ci == 0, F.col("text")).otherwise(suffixed)
            ).withColumn(
                "n_chars",
                F.when(ci == 0, F.col("n_chars")).otherwise(
                    F.length("text").cast("long")
                ),
            )
        if table == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(ci == 0, F.col("embedding")).otherwise(
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + ci.cast("double") * F.lit(1e-3)).cast(
                            "float"
                        ),
                    )
                ),
            )
        out = df.drop("__copy")
        out.write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        n = spark.read.parquet(f"{dst}/{table}.parquet").count()
        print(f"{table}: {n} rows")
    spark.stop()
    print(f"sf1 written to {dst}")


if __name__ == "__main__":
    main()
