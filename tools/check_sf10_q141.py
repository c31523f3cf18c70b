#!/usr/bin/env python3
"""Blocked DuckDB replay of the q141 oracle for the sf10 curation slice
(220k vectors x 1000 coarse lists) — blocked_replay.q141_oracle with the
sf10 chunk counts. The one-shot q141 plan materializes the 220M-row
vector-x-centroid cross join through a window function (>78 GB of spill);
the ENGINE runs the identical plan in ~68 s — only the oracle engine needs
the chunking, which is result-identical by construction (per-vector argmax
chunked on vec_id, in-cluster pairwise chunked on cent_id).

Usage: python3 tools/check_sf10_q141.py [sliceDir outDir]
"""
import sys

from blocked_replay import connect, table_glob, q141_oracle, compare_engine


def main():
    slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10cur"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10cur_out"
    con = connect(mem="24GB")
    ocols, orows = q141_oracle(
        con, table_glob(slice_dir, "embeddings"), assign_chunks=20, pair_chunks=10,
        tag="q141-sf10", progress_every=1)
    ok = compare_engine(con, out_dir, "q141_semantic_dedup", ocols, orows)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
