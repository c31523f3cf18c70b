#!/usr/bin/env python3
"""Time every oracle SQL in <verifyOutDir>/oracle_sql.json against DuckDB
views over <sfDir> parquet (best of N runs, default 2). Emits one line per
query: `name<TAB>seconds`, plus a TOTAL line.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [runs]
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (synthetic slices)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0.0
    for name in sorted(oracles):
        sql = oracles[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        total += best
        print(f"{name}\t{best:.3f}", flush=True)
    print(f"TOTAL\t{total:.3f}")


if __name__ == "__main__":
    main()
