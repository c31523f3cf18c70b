#!/usr/bin/env python3
"""Blocked DuckDB replay of the q156/q161 IVF-PQ oracles for the sf100
curation slice (2.2M vectors x 1000 labels) — check_sf10_pq.py's machinery
(blocked_replay.pq_prepare + pq_query_oracle) at the sf100 chunk counts,
with the q156 coarse assignment (2.2M x 1000 = 2.2B scored pairs, the
check_sf100_q141.py shape) cached to parquet and VALIDATED against the
live slice before reuse.

Usage: python3 tools/check_sf100_pq.py [sliceDir outDir]
"""
import sys

from blocked_replay import (
    connect, table_glob, pq_prepare, pq_query_oracle, compare_engine,
    LABEL_CENTS_SQL, TRAINED_CENTS_SQL)


def main():
    slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100cur"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100cur_out"
    con = connect(mem="32GB", spill="/tmp/duck_pq_spill")
    glob = table_glob(slice_dir, "embeddings")
    pq_prepare(con, glob, pq_assign_chunks=16, tag="pq-sf100")
    c156 = pq_query_oracle(con, LABEL_CENTS_SQL, coarse_chunks=40,
                           cache="/tmp/q156_sf100_assigned.parquet", tag="pq-sf100",
                           glob=glob)
    ok156 = compare_engine(con, out_dir, "q156_ivf_pq_topk", *c156, sort=True)
    c161 = pq_query_oracle(con, TRAINED_CENTS_SQL, coarse_chunks=40, tag="pq-sf100")
    ok161 = compare_engine(con, out_dir, "q161_ivf_pq_trained_topk", *c161, sort=True)
    sys.exit(0 if (ok156 and ok161) else 1)


if __name__ == "__main__":
    main()
