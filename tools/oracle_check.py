#!/usr/bin/env python3
"""Rehearse the driver's t2 gate BEFORE the driver runs it.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOutDir] [onlyQuery...]

Reads the Verify-dumped parquet results + oracle_sql.json, runs each oracle
in DuckDB against views named after the graded tables, sorts columns by
name (the driver's compare contract), and diffs cell-by-cell on exact
string representations.

DECIMAL output columns are BANNED on either side: the driver's own decimal
canonicalization (not reproduced here) hashed Decimal('123.40') and
Decimal('123.4') differently in round 1, so a symmetric str() compare
passes while the real gate fails. Money must be emitted as DOUBLE computed
from exact integer cents (graft.engine.Det.money).

Dev tooling only — the engine itself is pure Scala/Spark.
"""
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Approx-sketch queries can never bit-match an oracle (different sketch
# algorithms), but a BROKEN sketch is off by orders of magnitude, not by
# its error bound. For each: an exact DuckDB twin and a relative tolerance
# sized at several times the sketch's configured error (rsd 0.02 /
# accuracy 1000 / HLL lgK default ~1.6% rsd), so the rehearsal catches a
# broken implementation while honest estimation noise passes. String
# (group-key) cells still compare exactly, as do row counts and schemas.
TOLERANCE = {
    "agg_approx_distinct": (
        """SELECT o_orderstatus, count(DISTINCT o_custkey) AS approx_custs
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        0.10),
    "agg_approx_percentile": (
        """SELECT event_type,
                  round(quantile_cont(value, 0.5), 6) AS p50,
                  round(quantile_cont(value, 0.95), 6) AS p95
           FROM events GROUP BY event_type ORDER BY event_type""",
        0.05),
    "agg_hll_sketch": (
        """SELECT * FROM (
             SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS DOUBLE)
                    AS n_custs FROM orders GROUP BY o_orderstatus
             UNION ALL
             SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS DOUBLE)
             FROM orders
           ) ORDER BY o_orderstatus""",
        0.10),
    # cross-shard union must reproduce the single-sketch estimate class:
    # exact distinct per type, 10% envelope (HLL lgK default ~1.6% rsd)
    "agg_hll_union": (
        """SELECT event_type, CAST(count(DISTINCT user_id) AS DOUBLE)
               AS n_users
           FROM events GROUP BY event_type ORDER BY event_type""",
        0.10),
}


def within_tol(gv, wv, rtol):
    """True when the cells agree exactly, or both parse as numbers within
    relative tolerance."""
    if gv == wv:
        return True
    try:
        g, w = float(gv), float(wv)
    except (TypeError, ValueError):
        return False
    return abs(g - w) <= rtol * max(abs(w), 1.0)


def check_tolerance(con, outdir, name, sql, rtol):
    """Compare the Spark dump for `name` to an exact twin within rtol.
    Returns None on pass, else a failure description."""
    gcols, got = fetch(
        con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    wcols, want = fetch(con, sql)
    if gcols != wcols:
        return f"schema: spark={gcols} oracle={wcols}"
    if len(got) != len(want):
        return f"rowcount: spark={len(got)} oracle={len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        for j, (gv, wv) in enumerate(zip(g, w)):
            if not within_tol(gv, wv, rtol):
                return (f"row {i} col {gcols[j]}: spark={gv!r} outside "
                        f"±{rtol:.0%} of exact {wv!r}")
    return None


def fetch(con, sql, sort_canary=True):
    """Run sql; return (sorted column names, rows with cols sorted by name,
    as stringified tuples).

    Also REPRODUCES the driver's pandas row-sort as a crash canary: the
    driver loads each result into pandas and sort_values over every column
    before hashing, and that lexsort crashes on array-typed cells
    (CORRECTNESS_r08: fn_array_higher_order, ml_feature_vector red-celled
    this way while the order-based rehearsal passed). Running the same
    sort here means a query the driver would crash on crashes the
    rehearsal first. The comparison itself stays on the ORDER BY row
    order (the tolerance path pairs rows by position)."""
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    raw = [[row[i] for i in order] for row in cur.fetchall()]
    if sort_canary and raw and scols:
        import pandas as pd
        pd.DataFrame(raw, columns=scols).sort_values(by=scols)
    rows = [tuple(cell_str(v) for v in r) for r in raw]
    return scols, rows


def cell_str(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def decimal_cols(con, sql):
    """Column names whose type is DECIMAL or HUGEINT in the query's result.
    Both are driver-canonicalization hazards: DECIMAL hashes trailing zeros
    differently (round 1), and DuckDB's SUM(BIGINT) returns HUGEINT (int128)
    which the driver hashes differently from Spark's BIGINT even when the
    values are identical (round 4, dq_checksum_table). Wrap sums as
    CAST(SUM(...) AS BIGINT)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [r[0] for r in rows
            if "DECIMAL" in r[1].upper() or "HUGEINT" in r[1].upper()]


def main():
    # --json PATH: additionally write a per-query record in the DRIVER'S
    # CORRECTNESS_r*.json schema ({rows_match, schema_match, hash_match,
    # spark_rows, oracle_rows, err}) — the self-defending round artifact
    # the r7 verdict asked for after the driver shipped an empty {}.
    # No-oracle declared queries (a Verify dump dir without an oracle_sql
    # entry) are recorded exactly as the driver records them: err =
    # "no_oracle" with the spark row count.
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    report = {}

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
    t_start = time.monotonic()

    # Per-THREAD DuckDB connections (r11 verdict ask #4: the sequential
    # replay hit ~13.5 min at 552 queries and crowds the gate): each query
    # is independent, DuckDB releases the GIL while executing, so a thread
    # pool gets near-linear speedup. Each worker connection caps its own
    # DuckDB parallelism so workers × threads ≈ the box, not workers × 32.
    tls = threading.local()

    def get_con():
        if not hasattr(tls, "con"):
            c = duckdb.connect()
            c.execute("SET TimeZone='UTC'")
            c.execute("SET threads=2")
            for t in TABLES:
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                          f"read_parquet('{sfdir}/{t}.parquet')")
            tls.con = c
        return tls.con

    con = get_con()  # main-thread connection for the sequential tail below
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    names = sorted(n for n in oracle if not only or n in only)
    ok, fails = [], []

    def check_one(name):
        """Returns (ok?, fail_why, record_kwargs) for one oracle query."""
        c = get_con()
        sql = oracle[name]
        try:
            gcols, got = fetch(
                c, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        except Exception as e:
            return (False, f"spark output unreadable: {e}",
                    dict(err=f"spark output unreadable: {e}"))
        try:
            wcols, want = fetch(c, sql)
        except Exception as e:
            return (False, f"oracle error: {e}",
                    dict(spark_rows=len(got), err=f"oracle error: {e}"))
        bad = decimal_cols(
            c, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        bad += [x for x in decimal_cols(c, sql) if x not in bad]
        if bad:
            return (False, f"DECIMAL/HUGEINT output banned (driver "
                           f"canonicalization diverges): {bad}",
                    dict(spark_rows=len(got), oracle_rows=len(want),
                         err=f"decimal/hugeint output: {bad}"))
        if gcols != wcols:
            return (False, f"schema: spark={gcols} oracle={wcols}",
                    dict(rows_match=len(got) == len(want), schema_match=False,
                         hash_match=False, spark_rows=len(got),
                         oracle_rows=len(want)))
        if len(got) != len(want):
            return (False, f"rowcount: spark={len(got)} oracle={len(want)}",
                    dict(rows_match=False, schema_match=True,
                         hash_match=False, spark_rows=len(got),
                         oracle_rows=len(want)))
        if got != want:
            detail = ""
            ndiff = 0
            for i, (g, w) in enumerate(zip(got, want)):
                for j, (gv, wv) in enumerate(zip(g, w)):
                    if gv != wv:
                        ndiff += 1
                        if not detail:
                            detail = (f" first diff row {i} col {gcols[j]}: "
                                      f"spark={gv!r} oracle={wv!r}")
            return (False, f"{ndiff} cells differ;{detail}",
                    dict(rows_match=True, schema_match=True, hash_match=False,
                         spark_rows=len(got), oracle_rows=len(want)))
        return (True, None, dict(rows_match=True, schema_match=True,
                                 hash_match=True, spark_rows=len(got),
                                 oracle_rows=len(want)))

    # r13 verdict #3: 8 workers measured 789 s on a loaded box at 594
    # checks — the replay is embarrassingly parallel, so run
    # min(16, cpus/2) workers with threads=2 per DuckDB connection
    # (workers × threads ≈ the box, as before: 16×2 = 8×4)
    workers = min(16, max(4, (os.cpu_count() or 8) // 2))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, (passed, why, rec) in zip(names, pool.map(check_one, names)):
            record(name, **rec)
            if passed:
                ok.append(name)
            else:
                fails.append((name, why))
    # sketch queries: exact-twin compare within the sketch's error budget
    tol_names = [n for n in sorted(TOLERANCE) if not only or n in only]
    for name in tol_names:
        sql, rtol = TOLERANCE[name]
        try:
            why = check_tolerance(con, outdir, name, sql, rtol)
        except Exception as e:
            why = f"tolerance check error: {e}"
        if why is None:
            print(f"PASS {name} (approx, within ±{rtol:.0%} of exact)")
            ok.append(name)
            record(name, err=f"no_oracle; approx pass within ±{rtol:.0%}")
        else:
            fails.append((name, why))
            record(name, err=f"no_oracle; approx FAIL: {why}")
    for name in sorted(n for n in ok if n not in TOLERANCE):
        print(f"PASS {name}")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(ok)}/{len(names) + len(tol_names)} queries match "
          f"({len(tol_names)} approx-tolerance) "
          f"in {time.monotonic() - t_start:.0f} s with {workers} workers")
    if json_out:
        # declared no-oracle queries: every Verify dump dir without an
        # oracle entry, recorded the way the driver records them
        for d in sorted(os.listdir(outdir)):
            if d in oracle or d in report or d == "oracle_sql.json":
                continue
            if only and d not in only:
                continue
            if not os.path.isdir(os.path.join(outdir, d)):
                continue
            try:
                # no-oracle queries may output array columns (ANN, sketches)
                # — the driver records their row counts without hashing, so
                # skip the sort canary here
                _, rows = fetch(
                    con, f"SELECT * FROM read_parquet('{outdir}/{d}/*.parquet')",
                    sort_canary=False)
                record(d, spark_rows=len(rows), err="no_oracle")
            except Exception as e:
                record(d, err=f"no_oracle; unreadable: {e}")
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=1)
        print(f"driver-schema report written: {json_out} ({len(report)} queries)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
