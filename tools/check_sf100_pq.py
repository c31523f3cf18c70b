#!/usr/bin/env python3
"""Blocked DuckDB replay of the q156/q161 IVF-PQ oracles for the sf100
curation slice (2.2M vectors x 1000 labels) — check_sf10_pq.py's argument
at 10x (r15 verdict task 2: the last ANN rows below their siblings'
2.2M-vector grade).

Soundness (unchanged from the sf10 tool; the chunk COUNTS are the only
difference): every stage is one of
  (a) a global aggregation executed ONE-SHOT on the full input (codebook
      means, centroid means, Lloyd recompute — nothing to argue);
  (b) a PER-VECTOR argmax/argmin chunked on vec_id%N — independent across
      vectors, so chunking is result-identical by construction; or
  (c) the tail (candidates, ADC, shortlist, rescore, ranks) executed
      ONE-SHOT on the already-small candidate set.
No stage's result depends on which chunk a vector lands in, so the blocked
composition computes exactly the declared one-shot SQL.

The q156 coarse assignment (2.2M x 1000 = 2.2B scored pairs, the
check_sf100_q141.py shape) is cached to parquet and VALIDATED against the
live slice (row count + id range) before reuse — a regenerated slice
forces a recompute instead of silently grading the wrong corpus.

Self-certification: the same script graded PASS at the sf10 slice whose
one-shot artifacts are verified (tools/check_sf10_pq.py), and the blocked
pattern is the one check_sf100_q141.py proved at 2.2M vectors.

Usage: python3 tools/check_sf100_pq.py [sliceDir outDir]
"""
import sys, os, math, time
import duckdb

slice_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100cur"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100cur_out"

# geometry/constants — must match graft.operators.Similarity
PQ_BLOCKS, PQ_BLOCK_DIM, PQ_CODES, PQ_SHORTLIST, NPROBE, DIM = 8, 8, 16, 50, 4, 64
PQ_ASSIGN_CHUNKS = 16   # 17.6M (vec,block) rows x 16 codes per pass
COARSE_CHUNKS = 40      # 2.2M vectors x 1000 cents (q141's chunk count)
ASSIGNED_CACHE = "/tmp/q156_sf100_assigned.parquet"

con = duckdb.connect()
con.execute("SET memory_limit='32GB'")
con.execute("SET temp_directory='/tmp/duck_pq_spill'")
con.execute("SET preserve_insertion_order=false")
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{slice_dir}/embeddings.parquet/*.parquet')"
)
t0 = time.time()

# ---- e (embNrmCte, one-shot) ----
con.execute("""
CREATE TABLE e AS
SELECT vec_id, embedding,
       sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
FROM embeddings
""")
print(f"e done ({time.time() - t0:.0f}s)", flush=True)

# ---- PQ codebooks (shared by q156/q161 — training never sees the coarse
# quantizer): gr/blocks one-shot, cb0 one-shot aggregation, pa1/enc
# chunked per-vector argmin (case b), cb1 one-shot aggregation over pa1 ----
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
print(f"blocks done ({time.time() - t0:.0f}s)", flush=True)
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
print(f"cb0 done ({time.time() - t0:.0f}s)", flush=True)


def pq_assign(dst, cb):
    """Per-(vec,block) nearest-code argmin vs codebook `cb`, chunked on
    vec_id — independent across vectors (soundness case b)."""
    con.execute(f"CREATE TABLE {dst} (vec_id BIGINT, b BIGINT, gvec BIGINT[], c INT)")
    for k in range(PQ_ASSIGN_CHUNKS):
        con.execute(f"""
        INSERT INTO {dst}
        SELECT vec_id, b, gvec, c FROM (
          SELECT s.vec_id, s.b, s.gvec, cb.c,
                 ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.b ORDER BY
                   list_sum(list_transform(range(1, {PQ_BLOCK_DIM} + 1),
                     i -> (s.gvec[i] - cb.cvec[i]) * (s.gvec[i] - cb.cvec[i]))) ASC, cb.c) AS crk
          FROM blocks s JOIN {cb} cb ON s.b = cb.b
          WHERE s.vec_id % {PQ_ASSIGN_CHUNKS} = {k}
        ) WHERE crk = 1
        """)
    print(f"{dst} done ({time.time() - t0:.0f}s)", flush=True)


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
con.execute("DROP TABLE pa1")
con.execute("DROP TABLE enc")
print(f"codes done ({time.time() - t0:.0f}s)", flush=True)


def coarse_assign(c2_sql, cache=None):
    """Coarse quantizer (one-shot c2) + chunked per-vector coarse assign
    (case b). `cache` persists/reuses the 2.2B-row q156 assignment,
    validated against the live e table before reuse."""
    con.execute("DROP TABLE IF EXISTS c2")
    con.execute("DROP TABLE IF EXISTS assigned")
    con.execute(f"CREATE TABLE c2 AS {c2_sql}")
    if cache and os.path.exists(cache):
        want = con.sql("SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM e").fetchone()
        got = con.sql(
            f"SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM read_parquet('{cache}')"
        ).fetchone()
        if want == got:
            con.execute(f"CREATE TABLE assigned AS SELECT * FROM read_parquet('{cache}')")
            print(f"assigned loaded from cache ({time.time() - t0:.0f}s)", flush=True)
            return
        print(f"assigned cache STALE (cache {got} != slice {want}) — recomputing", flush=True)
    con.execute("CREATE TABLE assigned (vec_id BIGINT, cent_id INT)")
    for k in range(COARSE_CHUNKS):
        # ccos computed once in a derived table that drops the embedding
        # lists BEFORE the window (the check_sf100_q141.py OOM lesson)
        con.execute(f"""
        INSERT INTO assigned
        SELECT vec_id, cent_id FROM (
          SELECT vec_id, cent_id,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
          FROM (
            SELECT e.vec_id, c.cent_id,
                   (list_sum(list_transform(range(1, {DIM} + 1), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) AS ccos
            FROM e, c2 c
            WHERE e.vec_id % {COARSE_CHUNKS} = {k}
          )
        ) WHERE crk = 1
        """)
        if (k + 1) % 8 == 0 or k == COARSE_CHUNKS - 1:
            print(f"coarse chunk {k + 1}/{COARSE_CHUNKS} done ({time.time() - t0:.0f}s)", flush=True)
    if cache:
        con.execute(f"COPY assigned TO '{cache}' (FORMAT parquet)")


def tail_and_compare(qname):
    """The one-shot PQ tail (case c) over the current c2/assigned tables;
    compare against the engine parquet."""
    con.execute("DROP TABLE IF EXISTS probes")
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


# q156: label-mean coarse quantizer (1000 lists — the 2.2B-row assign, cached)
coarse_assign(f"""
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
""", cache=ASSIGNED_CACHE)
ok156 = tail_and_compare("q156_ivf_pq_topk")

# q161: trained coarse quantizer (8 clusters — the two-iteration grid-exact
# Lloyd replay; every stage one-shot-sized except the final coarse assign)
coarse_assign(f"""
WITH m0 AS (
  SELECT CAST(vec_id % 8 AS INT) AS cluster, i.i AS pos,
         CAST(CAST(SUM(CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS FLOAT) AS m
  FROM embeddings, (SELECT unnest(range(1, {DIM} + 1)) AS i) i
  GROUP BY cluster, i.i
), c0 AS (
  SELECT cluster AS cent_id, cvec,
         sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * x))) AS cnrm
  FROM (SELECT cluster, list(m ORDER BY pos) AS cvec FROM m0 GROUP BY cluster)
), a0 AS (
  -- argmax over SLIM (vec_id, cent_id, ccos) rows — the embedding lists
  -- never ride the window (the check_sf100_q141.py OOM lesson); the join
  -- back on the unique vec_id reproduces the one-shot a1 rows exactly
  SELECT vec_id, cent_id AS cluster FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM (
      SELECT e.vec_id, c.cent_id,
             list_sum(list_transform(range(1, {DIM} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm) AS ccos
      FROM e, c0 c
    )
  ) WHERE crk = 1
), a1 AS (
  SELECT a0.vec_id, e.embedding, a0.cluster FROM a0 JOIN e USING (vec_id)
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
ok161 = tail_and_compare("q161_ivf_pq_trained_topk")

sys.exit(0 if (ok156 and ok161) else 1)
