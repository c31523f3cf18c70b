#!/usr/bin/env python3
"""Time oracle SQL against DuckDB views over <sfDir> parquet.

Batch mode (the original):
    python3 tools/time_oracle.py <sfDir> <verifyOutDir> [runs]
times every oracle in <verifyOutDir>/oracle_sql.json (best of N runs,
default 2), emits `name<TAB>seconds` per query plus a TOTAL line.

Serve mode (the phase-robust bench pairing — r15 verdict task 1):
    python3 tools/time_oracle.py --serve <sfDir> <oracleJsonPath>
loads the oracle map once, prints `READY`, then answers one request per
stdin line: a query name -> ONE timed execution, reply `name<TAB>seconds`
(or `name<TAB>ERR <msg>`). EOF exits 0. The caller (graft.Bench) drives
engine/DuckDB runs interleaved A/B/A/B per query inside one invocation,
so host phase cancels PER QUERY in the ratio instead of per total —
two same-HEAD readings straddled the 2.60-2.90 band in r15 because the
engine block and the DuckDB block ran minutes apart.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (synthetic slices)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def serve(sf_dir, oracle_path):
    con = connect(sf_dir)
    oracles = json.load(open(oracle_path))
    print("READY", flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}\tERR unknown query", flush=True)
            continue
        try:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            print(f"{name}\t{time.perf_counter() - t0:.3f}", flush=True)
        except Exception as e:
            print(f"{name}\tERR {type(e).__name__}", flush=True)


def batch(sf_dir, out_dir, runs):
    con = connect(sf_dir)
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
    if sys.argv[1] == "--serve":
        serve(sys.argv[2], sys.argv[3])
    else:
        batch(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
