#!/usr/bin/env python3
"""Blocked DuckDB replay of the q156/q161 IVF-PQ oracles for the sf10
curation slice (200k vectors x 1000 labels) — blocked_replay.pq_prepare +
pq_query_oracle at the sf10 chunk counts. Every stage is one of: pure
aggregation (one-shot), per-vector argmax/argmin (chunked on vec_id,
result-identical by construction), or a candidate-set tail (one-shot on
the already-tiny shortlist).

Usage: python3 tools/check_sf10_pq.py [sliceDir outDir]
"""
import sys

from blocked_replay import (
    connect, table_glob, pq_prepare, pq_query_oracle, compare_engine,
    LABEL_CENTS_SQL, TRAINED_CENTS_SQL)


def main():
    slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10cur"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10cur_out"
    con = connect(mem="24GB")
    glob = table_glob(slice_dir, "embeddings")
    pq_prepare(con, glob, pq_assign_chunks=4, tag="pq-sf10")
    c156 = pq_query_oracle(con, LABEL_CENTS_SQL, coarse_chunks=20, tag="pq-sf10")
    ok156 = compare_engine(con, out_dir, "q156_ivf_pq_topk", *c156, sort=True)
    c161 = pq_query_oracle(con, TRAINED_CENTS_SQL, coarse_chunks=20, tag="pq-sf10")
    ok161 = compare_engine(con, out_dir, "q161_ivf_pq_trained_topk", *c161, sort=True)
    sys.exit(0 if (ok156 and ok161) else 1)


if __name__ == "__main__":
    main()
