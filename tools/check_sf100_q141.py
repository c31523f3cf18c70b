#!/usr/bin/env python3
"""Blocked DuckDB replay of the q141 oracle for the sf100 curation slice
(2M base + 200k dup-injected vectors x 1000 coarse lists).

Same relational spec and the same soundness argument as
tools/check_sf10_q141.py, at 10x: the assignment stage is a per-vector
argmax (independent across vectors — chunked on vec_id%40, blocking is
result-identical by construction) and the epsilon-ball pairwise stage
never crosses clusters (chunked on cent_id%100). The r14 verdict asked
for one sound attempt at this corner ("per-centroid-block argmin replay");
measured DuckDB rates (~2M scored pairs/s) put the 2.2B-row assignment at
~20 min and the ~4.8B-row pairwise at ~1-2 h — long, but one-shot-sound,
so the rung is oracle-FEASIBLE after all.

Usage: python3 tools/check_sf100_q141.py [sliceDir outDir]
"""
import sys, math, time
import duckdb

slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100cur"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100cur_out"
ASSIGN_CHUNKS, PAIR_CHUNKS = 40, 200

con = duckdb.connect()
con.execute("SET memory_limit='32GB'")
con.execute("SET temp_directory='/tmp/duck_q141_spill'")  # spill, don't OOM
con.execute("SET preserve_insertion_order=false")
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{slice_dir}/embeddings.parquet/*.parquet')"
)

t0 = time.time()
con.execute("""
CREATE TABLE c2 AS
WITH cpos AS (
  SELECT label, i.i AS pos,
         CAST(CAST(SUM(CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS FLOAT) AS m
  FROM embeddings, (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i) i
  GROUP BY label, i.i
), cents AS (
  SELECT label AS cent_id, list(m ORDER BY pos) AS cvec FROM cpos GROUP BY label
)
SELECT cent_id, cvec,
       sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * x))) AS cnrm
FROM cents
""")
print(f"cents done ({time.time() - t0:.0f}s)", flush=True)

con.execute("""
CREATE TABLE e AS
WITH eall AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 10 = 0
)
SELECT vec_id, embedding,
       sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
FROM eall
""")
print(f"e done ({time.time() - t0:.0f}s)", flush=True)

import os
ASSIGNED_CACHE = "/tmp/q141_sf100_assigned.parquet"


def cache_valid():
    """The cache is keyed by nothing, so validate it against THIS slice
    before reuse (r15 ADVICE): row count and id range must match the e
    table exactly — a regenerated slice (different reps/env) fails both
    and forces a recompute instead of silently grading the wrong corpus."""
    if not os.path.exists(ASSIGNED_CACHE):
        return False
    want = con.sql("SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM e").fetchone()
    got = con.sql(
        f"SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM read_parquet('{ASSIGNED_CACHE}')"
    ).fetchone()
    if want != got:
        print(f"assigned cache STALE (cache {got} != slice {want}) — recomputing", flush=True)
        return False
    return True


if cache_valid():
    # the assignment phase is deterministic — reuse a prior run's dump so
    # a pairwise-phase retry doesn't redo the 2.2B-row argmax
    con.execute(f"CREATE TABLE assigned AS SELECT * FROM read_parquet('{ASSIGNED_CACHE}')")
    print(f"assigned loaded from cache ({time.time() - t0:.0f}s)", flush=True)
else:
    con.execute("CREATE TABLE assigned (vec_id BIGINT, cent_id INT, ccos DOUBLE)")
    for k in range(ASSIGN_CHUNKS):
        # ccos computed ONCE in a derived table that drops the embedding
        # lists BEFORE the window — the naive double-evaluated form
        # materialized the chunk's cross product with lists and OOM'd 44 GB
        con.execute(f"""
        INSERT INTO assigned
        SELECT vec_id, cent_id, ccos FROM (
          SELECT vec_id, cent_id, ccos,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
          FROM (
            SELECT e.vec_id, c.cent_id,
                   (list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) AS ccos
            FROM e, c2 c
            WHERE e.vec_id % {ASSIGN_CHUNKS} = {k}
          )
        ) WHERE crk = 1
        """)
        print(f"assign chunk {k + 1}/{ASSIGN_CHUNKS} done ({time.time() - t0:.0f}s)", flush=True)
    con.execute(f"COPY assigned TO '{ASSIGNED_CACHE}' (FORMAT parquet)")

# one 2.2M-row join TOTAL attaches embeddings to assignments (the
# per-chunk rebuild dominated wall-clock when done 200×), with the chunk
# key precomputed; each pairwise chunk then filters this in-memory table.
# With both join sides a small filtered table, DuckDB can't pick the
# multi-M-row pair stream as a hash BUILD side (the first form spilled
# >50 GB per chunk doing exactly that); pairs never cross clusters, so
# chunking on cent_id stays result-identical.
con.execute(f"""
CREATE TABLE ec_all AS
SELECT a.vec_id, a.cent_id, a.cent_id % {PAIR_CHUNKS} AS ck, a.ccos, e.embedding, e.nrm
FROM assigned a JOIN e ON a.vec_id = e.vec_id
""")
print(f"ec_all built ({time.time() - t0:.0f}s)", flush=True)
con.execute("CREATE TABLE drp (vec_id BIGINT)")
for k in range(PAIR_CHUNKS):
    con.execute(f"""
    INSERT INTO drp
    SELECT DISTINCT va AS vec_id FROM (
      SELECT a.vec_id AS va, a.ccos AS ca, b.vec_id AS vb, b.ccos AS cb,
             round(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm), 6) AS cos
      FROM (SELECT * FROM ec_all WHERE ck = {k}) a
      JOIN (SELECT * FROM ec_all WHERE ck = {k}) b
        ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id
    ) WHERE cos >= 0.9 AND (cb < ca OR (cb = ca AND vb < va))
    """)
    if (k + 1) % 10 == 0 or k == PAIR_CHUNKS - 1:
        print(f"pairwise chunk {k + 1}/{PAIR_CHUNKS} done ({time.time() - t0:.0f}s)", flush=True)
con.execute("DROP TABLE IF EXISTS ec_all")

ora = con.sql("""
SELECT a.vec_id, a.cent_id, round(a.ccos, 6) AS ccos, (d.vec_id IS NOT NULL) AS is_dropped
FROM assigned a LEFT JOIN drp d USING (vec_id)
ORDER BY a.vec_id
""")
ocols, orows = ora.columns, ora.fetchall()

name = "q141_semantic_dedup"
sp = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
scols, srows = sp.columns, sp.fetchall()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9e}"
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), [tuple(norm_cell(r[i]) for i in order) for r in rows]


oc, orn = norm(ocols, orows)
sc, srn = norm(scols, srows)
ok = oc == sc and orn == srn
print(f"{'PASS' if ok else 'FAIL'} {name}: schema={oc == sc} rows={len(orn)}/{len(srn)} hash={orn == srn}")
sys.exit(0 if ok else 1)
