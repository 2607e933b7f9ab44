#!/usr/bin/env python
"""Full-registry oracle sweep at sf1 (10x the driver's bench SF):
run every registered query on Spark AND its DuckDB oracle over the
`tools/gen_sf1.py` data and compare with the driver-gate signal (row
count + column names + order-insensitive value hash).

VOLUME-SAFE since round 6: the r5 sweep's collect+sort comparison was
itself the scale bottleneck (spark.driver.maxResultSize on
dedup_simhash's 10x pair output; a 96 GiB retry SIGKILLed during
driver-side canonicalization; the DuckDB recursive-CTE connected-
components ground truth OOMed at 100.6 GiB — SF1_SWEEP_r05.json).
This sweep now uses:

- ``compare_query_folded`` for every entry: each Spark partition
  canonicalizes and hashes its own rows, the driver folds tiny
  order-insensitive partials, and the DuckDB side streams through
  fetchmany into the same fold — same signal, O(1) driver memory;
- a documented-tolerance compare (rel=1e-9) for the two PLAIN-SQL
  float-SUM entries (`tpch_q1_pricing_summary`, `join_star_revenue`):
  their oracle text is deliberately stock TPC-H SQL, so their float
  SUMs are summation-order dependent between engines at millions of
  rows (~1e-11 relative observed). The driver gate still compares
  them EXACTLY at sf0.01; only the sf1+ sweep is tolerant, and only
  on float cells (rows pair by their non-float key, non-floats exact);
- an ITERATIVE min-label oracle for `dedup_transitive_components`:
  the sf0.01 recursive `reach` CTE materializes all-pairs
  reachability (quadratic per component — the OOM), so at volume the
  sweep drives DuckDB through the equivalent fixpoint loop
  (label <- min(label, min over neighbors)) and exposes it as the
  same `reach(id, r)` relation the rest of the oracle text consumes
  unchanged. Same ground truth, O(nodes+edges) per iteration.

Usage:
    python tools/sf1_oracle_sweep.py [sf1_dir] [name_filter ...]
Writes one JSON line per entry to stdout and a summary line at the
end."""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402
from impala_hashset_count_spark.sources.tables import TABLES  # noqa: E402

import tests.oracle_harness as oh  # noqa: E402

# plain-SQL float-SUM class: exact at the driver gate (sf0.01),
# rel-tolerance at volume where IEEE summation order diverges.
# grouping_analytics joined the class at the r7 sf10 sweep: its
# ROLLUP/CUBE branches are deliberately STOCK SQL (`ROUND(SUM(qty),2)`
# runs as one text on both engines), so at 60M rows the 2nd decimal
# sits on the same summation-order boundary tpch_q1 documented at sf1.
TOLERANT_FLOAT = {
    "tpch_q1_pricing_summary": 1e-9,
    "join_star_revenue": 1e-9,
    "grouping_analytics": 1e-9,
    "join_left_customer_orders": 1e-9,
    "join_salted_skew": 1e-9,
}

# multi-branch oracles whose branches each fit the DuckDB memory limit
# but whose single-cursor UNION compounds the working sets past it —
# executed branch-at-a-time via _SequentialBranches (bit-identical
# under the order-insensitive fold). dedup_exact_stats: the r6 sf10
# probe's OOM. dedup_ngram_jaccard: same class found at the r7 sf10
# sweep (exact + minhash + edit branches each verified standalone —
# worst 388 s mcommon / 191 s mcand — while the one-cursor form died
# at 45.5 GiB).
BRANCH_SPLIT = {
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    # r8: the tagged embedding entry gained the kmeans CTE chain and
    # the within-cluster sd branches; the one-cursor form compounds
    # the banded pairs join, the unrolled Lloyd chain AND the sd
    # candidate DISTINCT into one working set (>76 GB of DuckDB temp
    # at sf10 — ENOSPC running SOLO). Each of its four branches fits
    # comfortably; the pairs branch alone passed at 827 s pre-change.
    "dedup_embedding_cosine",
    # r8: the 13-arm tier UNION spilled ~80 GB of temp at sf10 solo —
    # the kmv/bitmap/auto recomputations each rebuild wide
    # (group, hash/word) intermediates, and one cursor holds all of
    # them; per-branch it is the max of one tier.
    "hashset_count_tiers",
    # r9: the simhash/winnow pair — its two branches sit on DISJOINT
    # CTE families (the 60-column bit-sum signature chain vs the
    # winnowing fingerprint chain), so one cursor holds both working
    # sets for no reason; with the sig/wfp MATERIALIZED markers the
    # prefix-export path computes each family once. Added ahead of the
    # first sf100 run, where the 16-bit chunk space makes the simhash
    # branch's candidate set the entry's dominant working set.
    "dedup_simhash",
    # r9 sf100 lesson: the 7-branch corpus oracle references `tf` 26x
    # and `dbg` 14x across its CTE graph — single-cursor inlining
    # re-derived the 1e9-token aggregation per reference (40+ GB of
    # spill in the first ten minutes at sf100, killed at 96% disk).
    # Marked MATERIALIZED + branch-split, the token stream is computed
    # once and exported.
    "corpus_stats_documents",
}


def _cc_iterative_oracle_fn(oracle_sql: str):
    """Build an oracle_fn for `dedup_transitive_components` that
    replaces ONLY the recursive `reach` CTE with a DuckDB-side
    iterative min-label fixpoint, reusing the entry's own oracle text
    for the pair derivation (prefix) and the deg/tris/pagerank/output
    sections (suffix) verbatim — the ground truth stays the entry's
    own SQL, only the quadratic reachability materialization goes."""
    pre, rest = oracle_sql.split(",\n    edges AS (", 1)
    suffix = "WITH deg AS (SELECT" + rest.split("deg AS (SELECT", 1)[1]

    def run(con: duckdb.DuckDBPyConnection):
        con.execute(
            f"CREATE TEMP TABLE __pairs AS {pre} SELECT id_1, id_2 FROM pairs"
        )
        con.execute(
            "CREATE TEMP TABLE __edges AS "
            "SELECT id_1 AS src, id_2 AS dst FROM __pairs "
            "UNION SELECT id_2, id_1 FROM __pairs"
        )
        # the suffix references `pairs` (tris) and `edges` (deg,
        # pagerank) by their CTE names — surface the materialized
        # tables under those names
        con.execute("CREATE TEMP VIEW pairs AS SELECT * FROM __pairs")
        con.execute("CREATE TEMP VIEW edges AS SELECT * FROM __edges")

        con.execute(
            "CREATE TEMP TABLE __lbl AS "
            "SELECT src AS id, src AS lbl FROM __edges GROUP BY src"
        )
        for _ in range(200):
            con.execute(
                """
                CREATE OR REPLACE TEMP TABLE __lbl_next AS
                SELECT a.id, LEAST(a.lbl, COALESCE(m.mn, a.lbl)) AS lbl
                FROM __lbl a LEFT JOIN (
                    SELECT e.src AS id, MIN(l.lbl) AS mn
                    FROM __edges e JOIN __lbl l ON e.dst = l.id
                    GROUP BY e.src
                ) m ON a.id = m.id
                """
            )
            (changed,) = con.execute(
                "SELECT count(*) FROM __lbl a JOIN __lbl_next b "
                "ON a.id = b.id AND a.lbl <> b.lbl"
            ).fetchone()
            con.execute(
                "CREATE OR REPLACE TEMP TABLE __lbl AS SELECT * FROM __lbl_next"
            )
            if changed == 0:
                break
        else:
            raise RuntimeError("CC min-label oracle did not converge")
        # min-label fixpoint == MIN(r) over the reachable set: expose
        # the same reach(id, r) relation the suffix consumes
        con.execute("CREATE TEMP VIEW reach AS SELECT id, lbl AS r FROM __lbl")
        return con.execute(suffix)

    return run


def _pack_greedy_oracle_fn(oracle_sql: str):
    """Volume-safe oracle for `train_pack_greedy`: the entry's sf0.01
    oracle replays the greedy scan as a linear recursive CTE, which
    DuckDB executes as one join (and one working-table hash build) PER
    DOCUMENT — ~10k-deep recursion per lang at sf1 took 810 s and then
    OOMed during fetch (SF1_SWEEP_r06 first pass). The packing scan is
    inherently sequential per group, so at volume the sweep keeps the
    entry's own token-count derivation (the `t` CTE, verbatim) in
    DuckDB and replays ONLY the O(n) greedy fold in a Python loop over
    the ordered (lang, rn) stream — same ground truth, linear time,
    O(1) state per lang — then surfaces the result as a DuckDB temp
    table so the folded compare consumes it like any other cursor."""
    t_sql, _ = oracle_sql.split(",\n        p AS (", 1)
    t_sql = t_sql.split("WITH RECURSIVE t AS (", 1)[1].rsplit(")", 1)[0]

    def run(con: duckdb.DuckDBPyConnection):
        cur = con.execute(
            f"SELECT lang, doc_id, n_tokens FROM ({t_sql}) ORDER BY lang, rn"
        )
        out = []
        state: dict = {}
        while True:
            rows = cur.fetchmany(65536)
            if not rows:
                break
            for lang, doc_id, n_tokens in rows:
                bin_id, fill = state.get(lang, (None, None))
                if bin_id is None:
                    bin_id, fill, off = 1, n_tokens, 0
                elif fill + n_tokens > 512:
                    bin_id, fill, off = bin_id + 1, n_tokens, 0
                else:
                    off = fill
                    fill = fill + n_tokens
                state[lang] = (bin_id, fill)
                out.append((lang, doc_id, n_tokens, bin_id, off))
        con.execute(
            "CREATE TEMP TABLE __packed ("
            "lang VARCHAR, doc_id BIGINT, n_tokens INTEGER, "
            "bin_id BIGINT, seq_offset BIGINT)"
        )
        con.executemany(
            "INSERT INTO __packed VALUES (?, ?, ?, ?, ?)", out
        )
        return con.execute(
            "SELECT lang, doc_id, n_tokens, bin_id, seq_offset FROM __packed"
        )

    return run


class _SequentialBranches:
    """Cursor-shaped adapter that executes each top-level UNION ALL
    branch of a multi-branch oracle as its OWN DuckDB query and streams
    the results in sequence. The folded compare is an order-insensitive
    modular sum, so branch-at-a-time folding is bit-identical to one
    cursor over the whole UNION — but peak DuckDB memory drops from the
    SUM of every branch's working set (shared CTEs, the xrm window and
    ordered STRING_AGG states all live at once) to the MAX of one
    branch's. The r6 sf10 probe lost `dedup_exact_stats` to exactly
    that compounding: every branch measured individually fits well
    under the 48GB limit (worst 71 s / xsub_fp), while the single-query
    form peaks near the limit and died under Spark JVM co-tenancy.
    The SQL text itself is the entry's own oracle, unchanged.

    ``factory`` (r8): a zero-arg connection builder. When given, each
    branch runs on a FRESH connection and the previous one is CLOSED
    first — releasing its spill files. Memory splitting per branch is
    not enough on its own: DuckDB only frees temp storage when the
    connection goes, so a heavy multi-branch oracle otherwise
    accumulates the SUM of its branches' spills on disk even though
    only one branch is live (the r8 sf10 rerun of
    `dedup_ngram_jaccard` ENOSPC'd SOLO this way — ~70 GB of
    accumulated temp under the 48 GB memory limit).

    ``export_dir`` (r9, with ``factory``): branch-at-a-time execution
    re-derives the shared WITH prefix once PER BRANCH — at the r7 sf10
    sweep that re-derivation was 60% of the 7,708 s pass
    (`dedup_ngram_jaccard` 3,078.9 s / `dedup_embedding_cosine`
    1,548.9 s, each rebuilding the shingle / signature / Lloyd
    pipelines for every branch). With an export dir, every CTE the
    oracle itself marks ``AS MATERIALIZED`` (the author's existing
    declaration of the multiply-referenced heavy seams) is computed
    ONCE and COPY'd to parquet up front — each on a fresh connection
    so export spill never accumulates — and every branch then runs
    with temp VIEWs over those parquet files plus the remaining
    (unexported) CTE defs. Bit-exactness is by construction: the CTE
    text is executed verbatim, parquet round-trips the BIGINT /
    VARCHAR / DOUBLE / LIST cells exactly, and the fold is
    order-insensitive. Oracles with no MATERIALIZED marker (or no WITH
    at all, e.g. `hashset_count_tiers`) take the unchanged r8 path."""

    @staticmethod
    def _split(oracle_sql: str) -> tuple[str, list[str]]:
        """(shared WITH prefix, top-level UNION ALL branches) by PAREN
        DEPTH, not indentation: a seam is a ``UNION ALL`` token at
        depth 0 outside string literals, and the prefix ends at the
        first depth-0 ``SELECT``. Subsumes the r7 4-space-indent
        heuristic (those seams are depth-0 too) and handles oracles
        with other indentation or no WITH clause at all
        (`hashset_count_tiers`); inline UNION ALLs inside bloom/drift
        subqueries sit at depth > 0 and are correctly skipped."""
        depth = 0
        first_select = -1
        seams: list[int] = []
        i, n = 0, len(oracle_sql)
        while i < n:
            ch = oracle_sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "'":
                i += 1
                while i < n and oracle_sql[i] != "'":
                    i += 1
            elif ch == "-" and oracle_sql.startswith("--", i):
                # line comments may contain apostrophes/parens
                while i < n and oracle_sql[i] != "\n":
                    i += 1
            elif depth == 0:
                if first_select < 0 and oracle_sql.startswith("SELECT", i):
                    first_select = i
                elif oracle_sql.startswith("UNION ALL", i):
                    seams.append(i)
                    i += 8
            i += 1
        assert first_select >= 0, "oracle has no top-level SELECT"
        prefix = oracle_sql[:first_select]
        bounds = [first_select, *seams, n]
        branches = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            body = oracle_sql[a:b]
            if body.startswith("UNION ALL"):
                body = body[len("UNION ALL"):]
            branches.append(body)
        return prefix, branches

    @staticmethod
    def _split_ctes(prefix: str) -> tuple[str, list[tuple[str, str, bool]]]:
        """Parse a shared ``WITH [RECURSIVE] name AS [MATERIALIZED]
        (body), ...`` prefix into (head keyword(s), [(name, body,
        materialized)]) — paren-depth / string-literal / line-comment
        aware, same scanning rules as ``_split``."""
        import re

        s, n = prefix, len(prefix)

        def skip_ws(i: int) -> int:
            while i < n:
                if s[i].isspace():
                    i += 1
                elif s.startswith("--", i):
                    while i < n and s[i] != "\n":
                        i += 1
                else:
                    break
            return i

        i = skip_ws(0)
        m = re.match(r"WITH(\s+RECURSIVE)?\b", s[i:])
        assert m, f"prefix does not start with WITH: {s[i:i + 40]!r}"
        head = s[i:i + m.end()]
        i += m.end()
        ctes: list[tuple[str, str, bool]] = []
        while True:
            i = skip_ws(i)
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", s[i:])
            assert m, f"expected CTE name at {s[i:i + 40]!r}"
            name = m.group(0)
            i = skip_ws(i + m.end())
            assert s.startswith("AS", i), s[i:i + 40]
            i = skip_ws(i + 2)
            mat = s.startswith("MATERIALIZED", i)
            if mat:
                i = skip_ws(i + len("MATERIALIZED"))
            assert i < n and s[i] == "(", s[i:i + 40]
            depth, j = 0, i
            while j < n:
                ch = s[j]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
                elif ch == "'":
                    j += 1
                    while j < n and s[j] != "'":
                        j += 1
                elif ch == "-" and s.startswith("--", j):
                    while j < n and s[j] != "\n":
                        j += 1
                j += 1
            assert depth == 0, f"unbalanced parens in CTE {name}"
            ctes.append((name, s[i + 1:j], mat))
            i = skip_ws(j + 1)
            if i < n and s[i] == ",":
                i += 1
                continue
            break
        return head, ctes

    @staticmethod
    def _def_text(name: str, body: str, mat: bool) -> str:
        return f"{name} AS {'MATERIALIZED ' if mat else ''}({body})"

    def _register_exports(self, con):
        for name, path in self._exported.items():
            con.execute(
                f"CREATE OR REPLACE TEMP VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
        return con

    def __init__(
        self,
        con: duckdb.DuckDBPyConnection,
        oracle_sql: str,
        factory=None,
        export_dir: str | None = None,
    ):
        self._factory = factory
        self._with, self._branches = self._split(oracle_sql)
        self._con = con
        self._exported: dict[str, str] = {}
        if (
            export_dir is not None
            and factory is not None
            and "MATERIALIZED" in self._with
        ):
            head, ctes = self._split_ctes(self._with)
            os.makedirs(export_dir, exist_ok=True)
            for idx, (name, body, mat) in enumerate(ctes):
                if not mat:
                    continue
                # earlier exported names resolve through the temp
                # views; earlier UNEXPORTED defs ride along as a WITH
                # clause (unreferenced ones are never evaluated)
                defs = [
                    self._def_text(*c)
                    for c in ctes[:idx]
                    if c[0] not in self._exported
                ]
                q = (f"{head} " + ",\n".join(defs) + "\n" if defs else "") + body
                path = os.path.join(export_dir, f"{name}.parquet")
                con.execute(f"COPY ({q}) TO '{path}' (FORMAT PARQUET)")
                self._exported[name] = path
                # fresh connection per export: COPY spill is released
                # immediately instead of accumulating across exports
                con.close()
                con = self._register_exports(factory())
            self._con = con
            rem = [
                self._def_text(*c)
                for c in ctes
                if c[0] not in self._exported
            ]
            self._with = f"{head} " + ",\n".join(rem) + "\n" if rem else ""
        self._cur = con.execute(self._with + self._branches[0])
        self._next = 1
        self.description = self._cur.description

    def fetchmany(self, n: int):
        while True:
            rows = self._cur.fetchmany(n)
            if rows:
                return rows
            if self._next >= len(self._branches):
                if self._factory is not None:
                    self._con.close()  # idempotent; harness re-closes
                return []
            if self._factory is not None:
                self._con.close()  # release the finished branch's spill
                self._con = self._register_exports(self._factory())
            self._cur = self._con.execute(
                self._with + self._branches[self._next]
            )
            self._next += 1


def _duckdb_connection_dirs(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """gen_sf1.py writes Spark directory tables; register views over
    the part files (the sf0.x harness reads single-file tables).
    Memory/temp limits are explicit: DuckDB's default budget (80% of
    RAM) ignores the 24g Spark JVM sharing the box — the r6 first
    pass lost `train_pack_greedy` to exactly that co-tenancy OOM — and
    an explicit temp_directory keeps heavy oracles spilling to a
    volume with known headroom instead of dying."""
    con = duckdb.connect()
    # 48GB leaves room for the 24g Spark JVM; SPARK_GRAFT_SWEEP_DUCK_MEM
    # raises it for solo reruns of spill-heavy oracles (less memory ->
    # MORE spill: the ngram mcommon branch writes ~70 GB of temp under
    # 48GB but runs nearly spill-free at 80GB on this 125G box).
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_SWEEP_DUCK_MEM", "48GB")
        + "'"
    )
    con.execute("SET temp_directory='/tmp/duckdb_sweep_tmp'")
    for name in TABLES:
        # subset scale dirs (e.g. a TPC-H-only sf100) may genuinely
        # lack a table; register what exists — an oracle that needs a
        # missing view then fails by NAME instead of failing every
        # entry at connection time (the r8 sf100 corpus_stats lesson).
        # Tables may be Spark-written DIRECTORIES (gen_sf1.py) or
        # single files (tools/make_doc_slice.py, the driver testdata).
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.isfile(path):
            continue
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    name_filter = sys.argv[2:]
    oh.duckdb_connection = _duckdb_connection_dirs

    spark = get_spark("sf1-oracle-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = all_queries()
    names = [
        n
        for n in sorted(queries)
        if not name_filter or any(f in n for f in name_filter)
    ]
    results: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        t0 = time.perf_counter()
        phases: dict = {}
        try:
            if name in TOLERANT_FLOAT:
                oh.compare_query_tolerant(
                    spark, sf_dir, name, q.fn, q.oracle,
                    rel=TOLERANT_FLOAT[name],
                )
                status = {"status": "MATCH", "mode": "float-tolerant-1e-9"}
            elif name == "dedup_transitive_components":
                oh.compare_query_folded(
                    spark, sf_dir, name, q.fn, q.oracle,
                    oracle_fn=_cc_iterative_oracle_fn(q.oracle),
                    timings=phases,
                )
                status = {"status": "MATCH", "mode": "folded+iterative-cc"}
            elif name in BRANCH_SPLIT:
                export_dir = f"/tmp/duckdb_sweep_tmp/exports_{name}"
                try:
                    oh.compare_query_folded(
                        spark, sf_dir, name, q.fn, q.oracle,
                        oracle_fn=lambda con, _sql=q.oracle: _SequentialBranches(
                            con, _sql,
                            factory=lambda: _duckdb_connection_dirs(sf_dir),
                            export_dir=export_dir,
                        ),
                        timings=phases,
                    )
                finally:
                    shutil.rmtree(export_dir, ignore_errors=True)
                status = {
                    "status": "MATCH",
                    "mode": "folded+branch-split+prefix-export",
                }
            elif name == "train_pack_greedy":
                oh.compare_query_folded(
                    spark, sf_dir, name, q.fn, q.oracle,
                    oracle_fn=_pack_greedy_oracle_fn(q.oracle),
                    timings=phases,
                )
                status = {"status": "MATCH", "mode": "folded+linear-pack"}
            else:
                oh.compare_query_folded(
                    spark, sf_dir, name, q.fn, q.oracle, timings=phases
                )
                status = {"status": "MATCH", "mode": "folded"}
        except AssertionError as e:
            status = {"status": "MISMATCH", "reason": str(e)[:500]}
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            status = {
                "status": "ERROR",
                "reason": f"{type(e).__name__}: {e}"[:500],
                "trace": traceback.format_exc()[-800:],
            }
        status["sec"] = round(time.perf_counter() - t0, 1)
        status.update(phases)
        results[name] = status
        print(json.dumps({"entry": name, **status}), flush=True)
        spark.catalog.clearCache()
        # Shuffle files from completed entries are deleted by Spark's
        # ContextCleaner only when the owning shuffle objects are
        # GC'd; over a 50-entry sweep they otherwise ACCUMULATE on
        # /tmp until the heaviest entry hits ENOSPC mid-shuffle (the
        # r7 third-pass cascade: dedup_ngram_jaccard filled the disk,
        # DuckDB temp writes failed two entries later, the JVM's
        # Arrow allocator failed two after that, then the gateway
        # died). PYTHON gc first — an errored entry's DataFrame stays
        # pinned through py4j's object registry until Python collects
        # (the fourth-pass lesson: ngram's residue outlived its entry
        # and took hashset_count_tiers' oracle down) — then the JVM GC
        # lets ContextCleaner delete the files.
        gc.collect()
        spark._jvm.System.gc()

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(
        json.dumps(
            {
                "summary": f"{n_match}/{len(results)} MATCH",
                "mismatches": [
                    n for n, r in results.items() if r["status"] != "MATCH"
                ],
                "total_sec": round(sum(r["sec"] for r in results.values()), 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
