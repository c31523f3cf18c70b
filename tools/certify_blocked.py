#!/usr/bin/env python3
"""Certify EVERY blocked oracle replay against its ONE-SHOT declared SQL
(r16 verdict task 3). This is the empirical half of each replay's
soundness argument: the blocked machinery (tools/blocked_replay.py) must
reproduce the one-shot rows EXACTLY — schema, normalized values, order —
before its sf10/sf100 verdicts are trusted. Exit 1 on any divergence.

The certification corpus is SELF-BUILT at fixture scale, so one command
runs in minutes with chunk/block boundaries genuinely crossed:

  * per-replica + q65 families: a 10-replica SALTED slice derived from the
    fixture documents exactly like the Probe sf10/sf100 slices (token
    prefix "r<rep>_", doc_id + rep*10M) — the structural invariants the
    soundness arguments rely on (no cross-replica string equality,
    in-stride derivations), with block_reps=3 so 4 genuine blocks run;
  * q141 + IVF-PQ chunked families: the fixture embeddings directly
    (chunking soundness is per-vector independence — scale-free), with
    3-way chunks.

Usage: python3 tools/certify_blocked.py <fixtureSfDir> <oracleSqlJson> [workDir]
  fixtureSfDir  e.g. /root/testdata/sf0.01
  oracleSqlJson a Verify dump containing the declared oracle SQL
  workDir       scratch dir for the salted slice (default /tmp/graft_cert)
"""
import json
import os
import sys

import duckdb

from blocked_replay import (
    connect, table_glob, per_replica_oracle, q65_oracle, q141_oracle,
    pq_prepare, pq_query_oracle, compare_oracles,
    LABEL_CENTS_SQL, TRAINED_CENTS_SQL)

# every query the per-replica generic replay (check_sf100_docs.py) grades
# at the sf10/sf100 rungs (q65 has its own sound split, certified below)
PER_REPLICA_QUERIES = [
    "q147_prefix_jaccard_pairs",
    "q160_containment_pairs",
    "q168_containment_prefix_pairs",
    "q171_adaptive_containment_pairs",
    "q172_substring_spans",
    "q173_span_removal",
    "q174_substring_decontamination",
    # r19: the streaming at-arrival gate's relational oracle joins wins on
    # window md5 (salted text → replica-local) and derives epochs/excerpt
    # ids arithmetically from doc_id (in-stride), so the generic
    # per-replica argument covers it unchanged
    "q177_streaming_substring_gate",
]
REP_OFF = 10_000_000
N_REPS = 10


def build_salted_slice(fixture_dir, work_dir):
    """The Probe sf10/sf100 salting at fixture scale: 10 replicas, every
    token prefixed r<rep>_, ids in 10M strides."""
    os.makedirs(work_dir, exist_ok=True)
    out = f"{work_dir}/documents.parquet"
    src = table_glob(fixture_dir, "documents")
    con = duckdb.connect()
    con.execute(rf"""
    COPY (
      SELECT d.doc_id + t.rep * {REP_OFF} AS doc_id, d.source,
             regexp_replace(d.text, '(\S+)', 'r' || t.rep || '_\1', 'g') AS text
      FROM read_parquet('{src}') d, (SELECT unnest(range({N_REPS})) AS rep) t
    ) TO '{out}' (FORMAT parquet)
    """)
    n = con.sql(f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM read_parquet('{out}')").fetchone()
    con.close()
    print(f"[cert] salted slice at {out}: {n[0]} rows ({n[1]} distinct ids)", flush=True)
    return out


def oneshot(con, glob, sql, view="documents"):
    con.execute(f"DROP VIEW IF EXISTS {view}")
    con.execute(f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{glob}')")
    r = con.sql(sql)
    return r.columns, r.fetchall()


def main():
    fixture_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sql_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify1/oracle_sql.json"
    work_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_cert"
    oracle = json.load(open(sql_json))
    salted = build_salted_slice(fixture_dir, work_dir)
    emb_glob = table_glob(fixture_dir, "embeddings")
    n_fail = 0

    # --- per-replica family (4 blocks over the 10-replica salted slice) ---
    for q in PER_REPLICA_QUERIES:
        if q not in oracle:
            print(f"CERT-FAIL {q}: oracle SQL missing from {sql_json}")
            n_fail += 1
            continue
        con = connect()
        blocked = per_replica_oracle(con, salted, oracle[q], REP_OFF,
                                     block_reps=3, tag=f"cert:{q}")
        one = oneshot(con, salted, oracle[q])
        if not compare_oracles(q, blocked, one):
            n_fail += 1
        con.close()

    # --- q65 split (signatures blocked, band join one-shot) ---
    con = connect()
    blocked = q65_oracle(con, salted, REP_OFF, block_reps=3)
    one = oneshot(con, salted, oracle["q65_minhash_lsh_pairs"])
    if not compare_oracles("q65_minhash_lsh_pairs", blocked, one):
        n_fail += 1
    con.close()

    # --- q141 chunked (3 assign chunks x 7 pairwise chunks) ---
    con = connect()
    blocked = q141_oracle(con, emb_glob, assign_chunks=3, pair_chunks=7,
                          tag="cert:q141", progress_every=7)
    one = oneshot(con, emb_glob, oracle["q141_semantic_dedup"], view="embeddings")
    if not compare_oracles("q141_semantic_dedup", blocked, one):
        n_fail += 1
    con.close()

    # --- IVF-PQ chunked (3 pq-assign chunks, 3 coarse chunks) ---
    con = connect()
    pq_prepare(con, emb_glob, pq_assign_chunks=3, tag="cert:pq")
    for q, cents in (("q156_ivf_pq_topk", LABEL_CENTS_SQL),
                     ("q161_ivf_pq_trained_topk", TRAINED_CENTS_SQL)):
        blocked = pq_query_oracle(con, cents, coarse_chunks=3, tag=f"cert:{q}")
        # the one-shot SQL rebinds the embeddings view; pq tables stay put
        one = oneshot(con, emb_glob, oracle[q], view="embeddings")
        if not compare_oracles(q, blocked, one, sort=True):
            n_fail += 1
    con.close()

    # --- negative control: the harness itself must be able to fail ---
    # per-replica blocking over the UNSALTED fixture corpus (256-id blocks —
    # the fixture's natural duplication lives inside aligned 512-doc groups,
    # so 256 splits ~500 window pairs) severs the cross-doc duplicated
    # windows q172 detects — the exact unsoundness the salt exists to rule
    # out. If the compare still passes, the certification has lost its
    # teeth. (In-SQL derivations — dup copies, excerpts — stay with their
    # base doc under any partition, so only a split separating two
    # DIFFERENT raw docs sharing a window can expose unsound blocking, and
    # q172 is the family member with natural cross-doc matches.)
    con = connect()
    fix_glob = table_glob(fixture_dir, "documents")
    broken = per_replica_oracle(con, fix_glob, oracle["q172_substring_spans"],
                                rep_off=256, block_reps=1,
                                tag="cert:negctl")
    one = oneshot(con, fix_glob, oracle["q172_substring_spans"])
    print("[cert] negative control (unsalted corpus blocked) — expecting FAIL:",
          flush=True)
    if compare_oracles("negctl_q172_unsalted_blocked", broken, one):
        print("CERT-FAIL negative control: a mid-replica split PASSED — "
              "the harness cannot detect unsound blocking")
        n_fail += 1
    else:
        print("CERT-PASS negative control: unsound blocking detected as it must be")

    print(f"== certification: {'ALL PASS' if n_fail == 0 else f'{n_fail} FAIL'} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
