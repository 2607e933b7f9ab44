#!/usr/bin/env python
"""Materialize a deterministic doc-id slice of a scale dir's documents
table as a NEW scale dir (documents only), for oracle runs at corpus
volumes between the standard decades.

Why this exists: `dedup_exact_stats`' branches have CORPUS-GLOBAL
semantics (boilerplate = lines in >= 20 docs, xdup = grams duplicated
anywhere, drift/bloom partitions by doc_id % 20), so restricting a
full-corpus run's OUTPUT to a doc slice does not equal ground truth
over the slice — the sound way to push its certification past the
sf10 oracle ceiling is to run BOTH engines on the same genuinely
smaller corpus. A doc_id % k slice of sf100 is that corpus: real sf100
documents, 1/k the volume (k=2 -> a true sf50-equivalent, 2.5M docs).
Pair-local entries (`dedup_minhash_lsh`) do not need this — see
tools/sf100_slice_cert.py for their full-run slice-compare.

Usage: python tools/make_doc_slice.py SRC_SF_DIR OUT_DIR K
then:  python tools/sf1_oracle_sweep.py OUT_DIR dedup_exact_stats
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    dest = os.path.join(out, "documents.parquet")
    os.makedirs(out, exist_ok=True)
    src_glob = os.path.join(src, "documents.parquet")
    if os.path.isdir(src_glob):
        src_glob = os.path.join(src_glob, "*.parquet")
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src_glob}') "
        f"WHERE doc_id % {k} = 0) TO '{dest}' (FORMAT PARQUET)"
    )
    (n,) = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dest}')").fetchone()
    print(f"wrote {dest}: {n} docs (doc_id % {k} = 0 of {src})")


if __name__ == "__main__":
    main()
