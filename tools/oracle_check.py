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
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fetch(con, sql):
    """Run sql; return (sorted column names, rows with cols sorted by name,
    as stringified tuples)."""
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(cell_str(row[i]) for i in order) for row in cur.fetchall()]
    return [cols[i] for i in order], rows


def cell_str(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def decimal_cols(con, sql):
    """Column names whose type is DECIMAL in the given query's result."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [r[0] for r in rows if "DECIMAL" in r[1].upper()]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    names = sorted(n for n in oracle if not only or n in only)
    ok, fails = [], []
    for name in names:
        sql = oracle[name]
        try:
            gcols, got = fetch(
                con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        except Exception as e:
            fails.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            wcols, want = fetch(con, sql)
        except Exception as e:
            fails.append((name, f"oracle error: {e}"))
            continue
        bad = decimal_cols(
            con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        bad += [c for c in decimal_cols(con, sql) if c not in bad]
        if bad:
            fails.append((name, f"DECIMAL output banned (driver canonicalization"
                                f" diverges): {bad}"))
            continue
        if gcols != wcols:
            fails.append((name, f"schema: spark={gcols} oracle={wcols}"))
            continue
        if len(got) != len(want):
            fails.append((name, f"rowcount: spark={len(got)} oracle={len(want)}"))
            continue
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
            fails.append((name, f"{ndiff} cells differ;{detail}"))
            continue
        ok.append(name)
    for name in ok:
        print(f"PASS {name}")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(ok)}/{len(names)} queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
