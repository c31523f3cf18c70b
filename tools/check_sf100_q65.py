#!/usr/bin/env python3
"""Blocked-signature / GLOBAL-join DuckDB replay of the q65 oracle for the
sf100 dedup slice (5M salted docs).

Why the generic per-replica replay (check_sf100_docs.py) is UNSOUND for
q65 and only q65: the token salt zeroes cross-replica TRUE Jaccard, which
bounds every exact-intersection query (q147/q168/q171/q172) to
within-replica pairs — but MinHash-LSH also emits pairs whose SIGNATURE
BANDS collide by chance, and chance collisions ignore the salt. At 5M docs
the engine (correctly) reports ~12k cross-replica band-collision pairs a
per-replica oracle cannot enumerate.

Sound split instead (blocked_replay.q65_oracle): the signature stage is
per-document, so it replays in doc_id blocks with no soundness argument
needed; the band join + estimate then run ONE-SHOT over the complete
materialized signature table — complete by construction.

Usage: python3 tools/check_sf100_q65.py [sliceDir outDir [blockReps [repOff]]]
"""
import sys

from blocked_replay import connect, table_glob, q65_oracle, compare_engine


def main():
    slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100dd"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100dd_out"
    block_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    rep_off = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
    con = connect()
    ocols, orows = q65_oracle(con, table_glob(slice_dir, "documents"), rep_off, block_reps)
    ok = compare_engine(con, out_dir, "q65_minhash_lsh_pairs", ocols, orows)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
