#!/usr/bin/env python3
"""Single-node throughput comparison: run each oracle SQL in DuckDB against
the same parquet the Spark bench reads, wall-clock it, and print a table
next to the Spark per-query times.

Usage: python3 tools/duck_bench.py <sfDir> <verifyOutDir> <benchJson> [topN]

The oracle SQL is semantically identical to the Spark query (that is the
correctness gate), so the wall-clock ratio is a fair same-work comparison.
DuckDB runs with its default thread count on the same machine.

Dev tooling only — the engine itself is pure Scala/Spark.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    bench_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench2.json"
    top_n = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_times = json.load(open(bench_json))["queries"]

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # bound the damage a pathological oracle can do: the recursive-CTE
    # transitive closures explode superlinearly with sf (measured 33 GB of
    # temp spill at sf0.1 before being killed), so spill goes to /tmp and
    # any single query is interrupted after a budget instead of wedging
    # the whole comparison
    con.execute("SET temp_directory='/tmp/duck_bench_spill'")
    con.execute("SET memory_limit='16GB'")
    per_query_budget_s = float(
        sys.argv[5]) if len(sys.argv) > 5 else 60.0
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    import threading
    rows = []
    names = sorted(set(oracles) & set(spark_times))
    for name in names:
        t0 = time.monotonic()
        timer = threading.Timer(per_query_budget_s, con.interrupt)
        timer.start()
        try:
            con.execute(oracles[name]).fetchall()
            dt = time.monotonic() - t0
            rows.append((name, spark_times[name], dt))
        except Exception as e:
            print(f"SKIP {name}: {str(e)[:80]}", file=sys.stderr)
        finally:
            timer.cancel()

    if not rows:
        print("no comparable queries (empty name intersection or all skipped)")
        return
    rows.sort(key=lambda r: -(r[1] + r[2]))
    if top_n:
        rows = rows[:top_n]
    spark_total = sum(r[1] for r in rows)
    duck_total = sum(r[2] for r in rows)
    print(f"{'query':36s} {'spark_s':>8s} {'duckdb_s':>9s} {'ratio':>6s}")
    for name, s, d in rows:
        print(f"{name:36s} {s:8.2f} {d:9.2f} {s / d if d > 0 else 0:6.1f}")
    print(f"\n{len(rows)} comparable queries: spark {spark_total:.1f} s, "
          f"duckdb {duck_total:.1f} s, ratio {spark_total / duck_total:.2f}")


if __name__ == "__main__":
    main()
