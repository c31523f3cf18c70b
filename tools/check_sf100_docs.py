#!/usr/bin/env python3
"""BLOCKED DuckDB oracle replay for the sf100 document rung.

Usage:
  python3 tools/check_sf100_docs.py <sliceDir> <outDir> <query> [blockReps] [repOff]

At 5M salted documents the one-shot replay of the Jaccard/containment
oracles builds a multi-billion-row inverted-index self-join inside DuckDB —
hours of spill on this host. The salted slice makes a BLOCKED replay exactly
equal to the one-shot result:

  * every token of replica r is prefixed "r<r>_", so no shingle string is
    ever equal across replicas — candidate/true pair mass is replica-LOCAL;
  * both corpus derivations stay inside the replica's id stride
    (q67/q147/q170 dup injection: +1,000,000; q160/q168/q171 excerpts:
    +2,000,000; strides are repOff = 10,000,000 apart),

so running the UNMODIFIED oracle SQL over the `documents` view restricted to
`blockReps` consecutive replicas and concatenating the per-block rows yields
precisely the rows of the one-shot run (each ORDER BY is doc-id-leading, and
block ranges are id-ordered). The engine parquet is then compared with
check.py's normalization (columns sorted by name, floats canonicalized).

The oracle SQL is read from `<outDir>/oracle_sql.json` (written by the
sf100llm probe phase).
"""
import sys, os, json, glob

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import norm_rows  # noqa: E402

import duckdb  # noqa: E402


def main():
    slice_dir, out_dir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    block_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    rep_off = int(sys.argv[5]) if len(sys.argv) > 5 else 10_000_000
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[qname]
    doc_glob = f"{slice_dir}/documents.parquet/*.parquet" \
        if os.path.isdir(f"{slice_dir}/documents.parquet") else f"{slice_dir}/documents.parquet"

    con = duckdb.connect()
    n_reps = con.sql(
        f"SELECT CAST(max(doc_id) // {rep_off} AS INT) + 1 FROM read_parquet('{doc_glob}')"
    ).fetchone()[0]
    if n_reps is None:  # r14 ADVICE: empty slice → clean FAIL, not a TypeError
        print(f"FAIL {qname}: empty documents slice at {slice_dir}")
        sys.exit(1)
    print(f"[blocked] {qname}: {n_reps} replicas, {block_reps} per block")

    ocols, orows = None, []
    for lo in range(0, n_reps, block_reps):
        hi = min(lo + block_reps, n_reps)
        con.execute("DROP VIEW IF EXISTS documents")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_glob}') "
            f"WHERE doc_id >= {lo * rep_off} AND doc_id < {hi * rep_off}"
        )
        r = con.sql(sql)
        ocols = r.columns
        rows = r.fetchall()
        orows.extend(rows)
        print(f"[blocked] reps [{lo},{hi}): {len(rows)} rows (total {len(orows)})")

    got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{qname}/*.parquet')")
    gcols, grows = got.columns, got.fetchall()
    oc, orn = norm_rows(ocols, orows)
    gc, grn = norm_rows(gcols, grows)
    if oc != gc:
        print(f"FAIL {qname}: columns {gc} != oracle {oc}")
        sys.exit(1)
    if orn != grn:
        print(f"FAIL {qname}: rows differ (spark {len(grn)} vs oracle {len(orn)})")
        for i, (a, b) in enumerate(zip(grn, orn)):
            if a != b:
                print(f"  first diff row {i}:\n    spark : {a}\n    oracle: {b}")
                break
        sys.exit(1)
    print(f"PASS {qname} ({len(grn)} rows, blocked x{(n_reps + block_reps - 1) // block_reps})")


if __name__ == "__main__":
    main()
