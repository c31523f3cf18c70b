#!/usr/bin/env python3
"""BLOCKED DuckDB oracle replay for the sf100 document rung (generic
per-replica family — see tools/blocked_replay.py for the machinery and
tools/certify_blocked.py for the blocked==one-shot certification).

Usage:
  python3 tools/check_sf100_docs.py <sliceDir> <outDir> <query> [blockReps] [repOff]

Soundness (salted slices only): every token of replica r is prefixed
"r<r>_", so no string is equal across replicas — pair/window mass is
replica-LOCAL; and both corpus derivations stay inside the replica's id
stride (dup injection +1,000,000; excerpts +2,000,000; strides
repOff = 10,000,000 apart). Running the UNMODIFIED declared oracle SQL over
replica blocks and concatenating therefore equals the one-shot run (each
ORDER BY is doc-id-leading, and block ranges are id-ordered).
"""
import sys
import json

from blocked_replay import connect, table_glob, per_replica_oracle, compare_engine


def main():
    slice_dir, out_dir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    block_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    rep_off = int(sys.argv[5]) if len(sys.argv) > 5 else 10_000_000
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[qname]
    con = connect()
    ocols, orows = per_replica_oracle(
        con, table_glob(slice_dir, "documents"), sql, rep_off, block_reps)
    ok = compare_engine(con, out_dir, qname, ocols, orows)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
