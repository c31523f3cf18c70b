#!/usr/bin/env python3
"""Blocked DuckDB replay of the q141 oracle for the sf100 curation slice
(2M base + 200k dup-injected vectors x 1000 coarse lists) —
blocked_replay.q141_oracle at the sf100 chunk counts, with the 2.2B-row
assignment stage cached to parquet and VALIDATED against the live slice
(row count + id range) before reuse (r15 ADVICE: a regenerated slice
forces a recompute instead of silently grading the wrong corpus).

Measured DuckDB rates (~2M scored pairs/s) put the 2.2B-row assignment at
~20 min and the ~4.8B-row pairwise at ~1-2 h — long, but one-shot-sound.

Usage: python3 tools/check_sf100_q141.py [sliceDir outDir]
"""
import sys

from blocked_replay import connect, table_glob, q141_oracle, compare_engine


def main():
    slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100cur"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100cur_out"
    con = connect(mem="32GB", spill="/tmp/duck_q141_spill")
    ocols, orows = q141_oracle(
        con, table_glob(slice_dir, "embeddings"), assign_chunks=40, pair_chunks=200,
        cache="/tmp/q141_sf100_assigned.parquet", tag="q141-sf100", progress_every=10)
    ok = compare_engine(con, out_dir, "q141_semantic_dedup", ocols, orows)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
