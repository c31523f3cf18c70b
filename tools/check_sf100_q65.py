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

Sound split instead: the signature stage (corpus -> shingles -> md5 ->
16-perm minima) is PER-DOCUMENT, so it replays in doc_id blocks with no
soundness argument needed; the band join + estimate then run ONE-SHOT over
the complete materialized signature table — complete by construction.
The CTEs below are copied verbatim from the declared oracle SQL
(Registry.scala q65), split at the sg boundary.

Usage: python3 tools/check_sf100_q65.py [sliceDir outDir [blockReps [repOff]]]
"""
import sys, math
import duckdb

slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100dd"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100dd_out"
block_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
rep_off = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000

import os
doc_glob = f"{slice_dir}/documents.parquet/*.parquet" \
    if os.path.isdir(f"{slice_dir}/documents.parquet") else f"{slice_dir}/documents.parquet"

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
n_reps = con.sql(
    f"SELECT CAST(max(doc_id) // {rep_off} AS INT) + 1 FROM read_parquet('{doc_glob}')"
).fetchone()[0]
if n_reps is None:
    print(f"FAIL q65: empty documents slice at {slice_dir}")
    sys.exit(1)
print(f"[q65-blocked] {n_reps} replicas, {block_reps} per block", flush=True)

con.execute("CREATE TABLE sigs (doc_id BIGINT, sig BIGINT[])")
for lo in range(0, n_reps, block_reps):
    hi = min(lo + block_reps, n_reps)
    con.execute("DROP VIEW IF EXISTS documents")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_glob}') "
        f"WHERE doc_id >= {lo * rep_off} AND doc_id < {hi * rep_off}"
    )
    con.execute("""
    INSERT INTO sigs
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ), tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS dsh FROM tk
    ), hsh AS (
      SELECT doc_id, list_transform(dsh, x -> ('0x' || substr(md5(x),1,15))::BIGINT % 2147483647) AS hs FROM sh
    )
    SELECT doc_id, list_transform(range(0, 16),
      s -> CAST(list_min(list_transform(hs, h -> ((s*2+1) * h + s*12289) % 2147483647)) AS BIGINT)) AS sig
    FROM hsh
    """)
    print(f"[q65-blocked] sigs for reps [{lo},{hi}) done", flush=True)

ora = con.sql("""
WITH bands AS (
  SELECT doc_id, sig, b, array_to_string(sig[b*4+1 : b*4+4], ',') AS key
  FROM sigs, (SELECT unnest([0,1,2,3]) AS b)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT p.id1, p.id2,
       CAST(list_sum(list_transform(range(1, 17),
         i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16.0 AS est_jaccard
FROM pairs p JOIN sigs s1 ON p.id1 = s1.doc_id JOIN sigs s2 ON p.id2 = s2.doc_id
ORDER BY id1, id2
""")
ocols, orows = ora.columns, ora.fetchall()

name = "q65_minhash_lsh_pairs"
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
if not ok and orn != srn:
    for i, (a, b) in enumerate(zip(srn, orn)):
        if a != b:
            print(f"  first diff row {i}:\n    spark : {a}\n    oracle: {b}")
            break
sys.exit(0 if ok else 1)
