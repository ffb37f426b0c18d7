#!/usr/bin/env python3
"""One-off audit: column dtype classes of each Spark verify dump vs its
DuckDB oracle result. A width mismatch (INTEGER vs BIGINT) on a query that
passed the driver's r4 schema gate proves the driver tolerates widths;
mismatches confined to new queries are a real risk to fix."""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def types(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1].upper() for r in rows}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_mismatch = 0
    for name in sorted(oracle):
        try:
            sp = types(con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            du = types(con, oracle[name])
        except Exception as e:
            print(f"SKIP {name}: {e}")
            continue
        for c in sorted(set(sp) | set(du)):
            a, b = sp.get(c, "<missing>"), du.get(c, "<missing>")
            if a != b:
                n_mismatch += 1
                print(f"DIFF {name}.{c}: spark={a} oracle={b}")
    print(f"\n{n_mismatch} column dtype differences")


if __name__ == "__main__":
    main()
