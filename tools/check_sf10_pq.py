#!/usr/bin/env python3
"""Blocked DuckDB replay of the q156/q161 IVF-PQ oracles for the sf10
curation slice (200k vectors x 1000 labels).

Why blocked: the declared oracles' coarse-assign CTE is a vectors x
centroids cross join pushed through a window function — 200M rows each
carrying a 64-float list at the sf10 slice, the same shape whose one-shot
DuckDB plan out-spilled this host on q141 (the ENGINE runs the kernelized
argmax in seconds; only the oracle engine needs help).

Soundness: every stage below is one of
  (a) a global aggregation executed ONE-SHOT on the full input (codebook
      means, centroid means — nothing to argue);
  (b) a PER-VECTOR argmax/argmin chunked on vec_id%N — independent across
      vectors, so chunking is result-identical by construction (the
      check_sf10_q141.py argument); or
  (c) the tail (candidates, ADC, shortlist, rescore, ranks) executed
      ONE-SHOT on the already-tiny candidate set.
No stage's result depends on which chunk a vector lands in, so the blocked
composition computes exactly the declared one-shot SQL.

Self-certification: run against a slice whose engine parquet already
passed the ONE-SHOT oracle (e.g. /tmp/graft_sf1cur{,_out}) — a PASS there
proves blocked == one-shot empirically before trusting the sf10 verdict.

Usage: python3 tools/check_sf10_pq.py [sliceDir outDir]
"""
import sys, math
import duckdb

slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10cur"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10cur_out"

# geometry/constants — must match graft.operators.Similarity
PQ_BLOCKS, PQ_BLOCK_DIM, PQ_CODES, PQ_SHORTLIST, NPROBE, DIM = 8, 8, 16, 50, 4, 64
ASSIGN_CHUNKS = 20

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{slice_dir}/embeddings.parquet/*.parquet')"
)

# ---- e (embNrmCte, one-shot) ----
con.execute("""
CREATE TABLE e AS
SELECT vec_id, embedding,
       sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
FROM embeddings
""")

# ---- PQ codebooks (shared by q156/q161 — training never sees the coarse
# quantizer): gr/blocks one-shot, cb0 one-shot aggregation, pa1/codes
# chunked per-vector argmin, cb1 one-shot aggregation over pa1 ----
con.execute(f"""
CREATE TABLE blocks AS
WITH gr AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS g
  FROM embeddings
)
SELECT vec_id, bb.b AS b,
       list_transform(range(1, {PQ_BLOCK_DIM} + 1), j -> g[bb.b * {PQ_BLOCK_DIM} + j]) AS gvec
FROM gr, (SELECT unnest(range(0, {PQ_BLOCKS})) AS b) bb
""")
con.execute(f"""
CREATE TABLE cb0 AS
WITH cb0j AS (
  SELECT b, CAST(vec_id % {PQ_CODES} AS INT) AS c, j.j AS j,
         CAST(SUM(gvec[j.j]) // COUNT(*) AS BIGINT) AS cg
  FROM blocks, (SELECT unnest(range(1, {PQ_BLOCK_DIM} + 1)) AS j) j
  GROUP BY b, c, j.j
)
SELECT b, c, list(cg ORDER BY j) AS cvec FROM cb0j GROUP BY b, c
""")


def pq_assign(dst, cb):
    """Per-(vec,block) nearest-code argmin vs codebook `cb`, chunked on
    vec_id — independent across vectors (soundness case b)."""
    con.execute(f"CREATE TABLE {dst} (vec_id BIGINT, b BIGINT, gvec BIGINT[], c INT)")
    for k in range(4):
        con.execute(f"""
        INSERT INTO {dst}
        SELECT vec_id, b, gvec, c FROM (
          SELECT s.vec_id, s.b, s.gvec, cb.c,
                 ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.b ORDER BY
                   list_sum(list_transform(range(1, {PQ_BLOCK_DIM} + 1),
                     i -> (s.gvec[i] - cb.cvec[i]) * (s.gvec[i] - cb.cvec[i]))) ASC, cb.c) AS crk
          FROM blocks s JOIN {cb} cb ON s.b = cb.b
          WHERE s.vec_id % 4 = {k}
        ) WHERE crk = 1
        """)
    print(f"{dst} done", flush=True)


pq_assign("pa1", "cb0")
con.execute(f"""
CREATE TABLE cb1 AS
WITH cb1j AS (
  SELECT b, c, j.j AS j, CAST(SUM(gvec[j.j]) // COUNT(*) AS BIGINT) AS cg
  FROM pa1, (SELECT unnest(range(1, {PQ_BLOCK_DIM} + 1)) AS j) j
  GROUP BY b, c, j.j
)
SELECT b, c, list(cg ORDER BY j) AS cvec FROM cb1j GROUP BY b, c
""")
pq_assign("enc", "cb1")
con.execute("CREATE TABLE codes AS SELECT vec_id, b, c AS code FROM enc")


def coarse_and_tail(qname, c2_sql):
    """Coarse quantizer (one-shot c2), chunked per-vector coarse assign,
    then the one-shot PQ tail; compare against the engine parquet."""
    con.execute("DROP TABLE IF EXISTS c2")
    con.execute("DROP TABLE IF EXISTS assigned")
    con.execute("DROP TABLE IF EXISTS probes")
    con.execute(f"CREATE TABLE c2 AS {c2_sql}")
    con.execute("CREATE TABLE assigned (vec_id BIGINT, cent_id INT)")
    for k in range(ASSIGN_CHUNKS):
        con.execute(f"""
        INSERT INTO assigned
        SELECT vec_id, cent_id FROM (
          SELECT e.vec_id, c.cent_id,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   (list_sum(list_transform(range(1, {DIM} + 1), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) DESC,
                   c.cent_id) AS crk
          FROM e, c2 c
          WHERE e.vec_id % {ASSIGN_CHUNKS} = {k}
        ) WHERE crk = 1
        """)
    print(f"{qname}: assigned done", flush=True)
    con.execute(f"""
    CREATE TABLE probes AS
    SELECT query_id, probe_cent FROM (
      SELECT q.vec_id AS query_id, c.cent_id AS probe_cent,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               (list_sum(list_transform(range(1, {DIM} + 1), i -> CAST(q.embedding[i] AS DOUBLE) * c.cvec[i])) / (q.nrm * c.cnrm)) DESC,
               c.cent_id) AS crk
      FROM e q, c2 c WHERE q.vec_id < 10
    ) WHERE crk <= {NPROBE}
    """)
    ora = con.sql(f"""
    WITH cand AS (
      SELECT p.query_id, a.vec_id AS cand_id
      FROM assigned a JOIN probes p ON a.cent_id = p.probe_cent AND a.vec_id <> p.query_id
    ), qb AS (
      SELECT vec_id AS query_id, b, gvec AS qvec FROM blocks WHERE vec_id < 10
    ), adc AS (
      SELECT cand.query_id, cand.cand_id,
             CAST(SUM(list_sum(list_transform(range(1, {PQ_BLOCK_DIM} + 1),
               i -> (qb.qvec[i] - cb.cvec[i]) * (qb.qvec[i] - cb.cvec[i])))) AS BIGINT) AS adc
      FROM cand
      JOIN codes co ON co.vec_id = cand.cand_id
      JOIN cb1 cb ON cb.b = co.b AND cb.c = co.code
      JOIN qb ON qb.query_id = cand.query_id AND qb.b = co.b
      GROUP BY cand.query_id, cand.cand_id
    ), short AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc ASC, cand_id) AS srk
        FROM adc
      ) WHERE srk <= {PQ_SHORTLIST}
    ), scored AS (
      SELECT s.query_id, s.cand_id,
             round(list_sum(list_transform(range(1, {DIM} + 1),
               i -> CAST(qe.embedding[i] AS DOUBLE) * ce.embedding[i])) / (qe.nrm * ce.nrm), 6) AS cos
      FROM short s
      JOIN e qe ON s.query_id = qe.vec_id
      JOIN e ce ON s.cand_id = ce.vec_id
    ), ranked AS (
      SELECT query_id, cand_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rk
      FROM scored
    )
    SELECT query_id, rk, cand_id, cos FROM ranked WHERE rk <= 10 ORDER BY query_id, rk
    """)
    ocols, orows = ora.columns, ora.fetchall()
    sp = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{qname}/*.parquet')")
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
        return sorted(cols), sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)

    oc, orn = norm(ocols, orows)
    sc, srn = norm(scols, srows)
    ok = oc == sc and orn == srn
    print(f"{'PASS' if ok else 'FAIL'} {qname}: schema={oc == sc} rows={len(orn)}/{len(srn)} hash={orn == srn}",
          flush=True)
    return ok


# q156: label-mean coarse quantizer (labelCentsCteSql)
ok156 = coarse_and_tail("q156_ivf_pq_topk", f"""
WITH cpos AS (
  SELECT label, i.i AS pos,
         CAST(CAST(SUM(CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS FLOAT) AS m
  FROM embeddings, (SELECT unnest(range(1, {DIM} + 1)) AS i) i
  GROUP BY label, i.i
), cents AS (
  SELECT label AS cent_id, list(m ORDER BY pos) AS cvec FROM cpos GROUP BY label
)
SELECT cent_id, cvec,
       sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * x))) AS cnrm
FROM cents
""")

# q161: trained coarse quantizer (trainedCentsCteSql — the two-iteration
# grid-exact Lloyd replay; 8 clusters, so every stage here is one-shot-
# sized except the final coarse assign, which reuses the chunked loop)
ok161 = coarse_and_tail("q161_ivf_pq_trained_topk", f"""
WITH m0 AS (
  SELECT CAST(vec_id % 8 AS INT) AS cluster, i.i AS pos,
         CAST(CAST(SUM(CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS FLOAT) AS m
  FROM embeddings, (SELECT unnest(range(1, {DIM} + 1)) AS i) i
  GROUP BY cluster, i.i
), c0 AS (
  SELECT cluster AS cent_id, cvec,
         sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * x))) AS cnrm
  FROM (SELECT cluster, list(m ORDER BY pos) AS cvec FROM m0 GROUP BY cluster)
), s1 AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         list_sum(list_transform(range(1, {DIM} + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm) AS ccos
  FROM e, c0 c
), a1 AS (
  SELECT vec_id, embedding, cent_id AS cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM s1
  ) WHERE crk = 1
), m1 AS (
  SELECT cluster, i.i AS pos,
         CAST(CAST(SUM(CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS FLOAT) AS m
  FROM a1, (SELECT unnest(range(1, {DIM} + 1)) AS i) i
  GROUP BY cluster, i.i
)
SELECT cluster AS cent_id, cvec,
       sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * x))) AS cnrm
FROM (SELECT cluster, list(m ORDER BY pos) AS cvec FROM m1 GROUP BY cluster)
""")

sys.exit(0 if (ok156 and ok161) else 1)
