#!/usr/bin/env python3
"""Blocked DuckDB replay of the q141 oracle for the sf10 curation slice.

The declared q141 oracle is one SQL statement; at the fixture scales the
driver runs it as-is. At the sf10 slice (220k vectors x 1000 coarse lists)
DuckDB's plan materializes the 220M-row vector-x-centroid cross join with
a 64-float list per row through a window function — >78 GB of spill, which
exhausts this host's disk. The ENGINE runs the identical plan in ~68 s;
only the oracle engine needs help. This script executes the SAME relational
spec in bounded blocks — assignment in vec_id%20 chunks, the in-cluster
pairwise stage in cent_id%10 chunks (the stages partition cleanly on those
keys, so blocked execution is result-identical by construction) — then
compares the concatenated result against the engine parquet with
tools/check.py's normalization.

Usage: python3 tools/check_sf10_q141.py [sliceDir outDir]
"""
import sys, glob, math
import duckdb

slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10cur"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10cur_out"

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{slice_dir}/embeddings.parquet/*.parquet')"
)

# centroids (c2 of the declared oracle) — label means on the 1e6 grid
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

# dup-injected vector set with norms (e of the declared oracle)
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

# nearest-centroid assignment, blocked on vec_id%20 (per-vector argmax is
# independent across vectors, so blocking cannot change any row)
con.execute("CREATE TABLE assigned (vec_id BIGINT, cent_id INT, ccos DOUBLE)")
for k in range(20):
    con.execute(f"""
    INSERT INTO assigned
    SELECT vec_id, cent_id, ccos FROM (
      SELECT e.vec_id, c.cent_id,
             (list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) AS ccos,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
               (list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) DESC,
               c.cent_id) AS crk
      FROM e, c2 c
      WHERE e.vec_id % 20 = {k}
    ) WHERE crk = 1
    """)
    print(f"assign chunk {k + 1}/20 done", flush=True)

# in-cluster pairwise drops, blocked on cent_id%10 (pairs never cross
# clusters, so blocking on the cluster key is result-identical)
con.execute("CREATE TABLE drp (vec_id BIGINT)")
for k in range(10):
    con.execute(f"""
    INSERT INTO drp
    SELECT DISTINCT va AS vec_id FROM (
      SELECT a.vec_id AS va, a.ccos AS ca, b.vec_id AS vb, b.ccos AS cb,
             round(list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * eb.embedding[i])) / (ea.nrm * eb.nrm), 6) AS cos
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE a.cent_id % 10 = {k}
    ) WHERE cos >= 0.9 AND (cb < ca OR (cb = ca AND vb < va))
    """)
    print(f"pairwise chunk {k + 1}/10 done", flush=True)

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
