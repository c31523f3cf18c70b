#!/usr/bin/env python3
"""Shared blocked-DuckDB-replay machinery for the synthetic-rung oracles
(r16 verdict task 3: one module instead of six copy-adapted scripts).

Three replay families, each a function returning the ORACLE's (cols, rows)
so the same code path serves both grading (compare vs the engine parquet)
and certification (compare vs the one-shot declared SQL on a slice where
one-shot is feasible — tools/certify_blocked.py):

  * per-replica (generic): run the UNMODIFIED declared oracle SQL over the
    `documents` view restricted to consecutive replica blocks and
    concatenate — sound on the SALTED slices because every cross-replica
    string differs and every derivation stays inside its id stride
    (check_sf100_docs.py's argument).
  * q65 split: signatures per replica block (per-document, trivially
    sound), band join + estimate ONE-SHOT over the complete signature
    table — because LSH chance collisions ignore the salt.
  * q141 / IVF-PQ chunked: per-vector argmax/argmin stages chunked on
    vec_id (independent across vectors, result-identical by construction),
    aggregations and candidate tails one-shot.

Every stage is one of those three shapes; nothing else is approximated.
"""
import math
import os

import duckdb


# ---------------------------------------------------------------- plumbing

def connect(mem="24GB", spill=None):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    if spill:
        con.execute(f"SET temp_directory='{spill}'")
        # preserve_insertion_order stays at its default (true): measured on
        # this DuckDB build, disabling it can scramble even final-ORDER-BY
        # output, and the grading compares are row-ordered
    return con


def table_glob(slice_dir, table):
    p = f"{slice_dir}/{table}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def slice_fingerprint(glob_pat):
    """path:size:mtime digest over the parquet files behind a glob — the
    cache-validity content key (r17 ADVICE: COUNT/MIN/MAX of vec_id alone
    let a regenerated slice with the same id range reuse a stale assignment
    table and grade wrong)."""
    import glob as _glob
    import hashlib
    files = sorted(_glob.glob(glob_pat)) or [glob_pat]
    parts = [f"{f}:{os.path.getsize(f)}:{int(os.path.getmtime(f) * 1000)}"
             for f in files if os.path.exists(f)]
    return hashlib.md5(",".join(parts).encode()).hexdigest()


def _cache_load(con, cache, fp, tag):
    """Load a persisted assignment table iff both the id-range check (done
    by the caller) and the slice content fingerprint match. Returns ok."""
    fpf = cache + ".fp"
    have = open(fpf).read().strip() if os.path.exists(fpf) else None
    if have != fp:
        print(f"[{tag}] assigned cache STALE (slice content fingerprint "
              f"changed) — recomputing", flush=True)
        return False
    return True


def _cache_store(con, cache, fp):
    con.execute(f"COPY assigned TO '{cache}' (FORMAT parquet)")
    with open(cache + ".fp", "w") as f:
        f.write(fp)


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9e}"
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def norm(cols, rows, sort=False):
    """check.py's normalization: columns sorted by name, floats
    canonicalized. `sort=True` additionally sorts rows (for replays whose
    concatenation order is not the declared ORDER BY)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), (sorted(out) if sort else out)


def diff_report(srn, orn):
    for i, (a, b) in enumerate(zip(srn, orn)):
        if a != b:
            print(f"  first diff row {i}:\n    spark : {a}\n    oracle: {b}")
            return


# build-stamp coherence across every compare_engine call in this process
# (r17 ADVICE: the blocked-replay graders never checked _GRAFT_STAMP, so the
# sf10/sf100 heavy-query paths lacked the guard check.py has): out_dir →
# {qname: stamp}; a second distinct stamp within one out_dir fails the grade.
_seen_stamps = {}


def _stamp_ok(out_dir, qname):
    sp = f"{out_dir}/{qname}/_GRAFT_STAMP"
    stamp = open(sp).read().strip() if os.path.exists(sp) else "unstamped"
    seen = _seen_stamps.setdefault(out_dir, {})
    seen[qname] = stamp
    vals = set(seen.values())
    if len(vals) > 1:
        print(f"ERROR: mixed build stamps under {out_dir}: "
              f"{sorted((q, s) for q, s in seen.items())}", flush=True)
        return False
    # r18 ADVICE: mirror check.py — a grade where EVERY dir is unstamped
    # passed silently, so a pre-stamp build's leftover rung outputs got no
    # coherence guarantee. Probe.writeRung stamps everything it writes, so
    # all-unstamped here means stale outputs: warn, fail under strict mode.
    if vals == {"unstamped"}:
        msg = (f"all graded query dirs under {out_dir} are unstamped "
               f"(no build coherence check possible)")
        if os.environ.get("GRAFT_STAMP_STRICT") == "1":
            print(f"ERROR: {msg}", flush=True)
            return False
        print(f"WARN: {msg}", flush=True)
    return True


def compare_engine(con, out_dir, qname, ocols, orows, sort=False):
    """Compare an oracle result against the engine parquet; returns ok."""
    if not _stamp_ok(out_dir, qname):
        return False
    sp = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{qname}/*.parquet')")
    scols, srows = sp.columns, sp.fetchall()
    oc, orn = norm(ocols, orows, sort)
    sc, srn = norm(scols, srows, sort)
    ok = oc == sc and orn == srn
    print(f"{'PASS' if ok else 'FAIL'} {qname}: schema={oc == sc} "
          f"rows={len(orn)}/{len(srn)} hash={orn == srn}", flush=True)
    if not ok and oc == sc:
        diff_report(srn, orn)
    return ok


def compare_oracles(qname, blocked, oneshot, sort=False):
    """Certification compare: blocked (cols, rows) vs one-shot (cols, rows)."""
    bc, brn = norm(*blocked, sort=sort)
    oc, orn = norm(*oneshot, sort=sort)
    ok = bc == oc and brn == orn
    print(f"{'CERT-PASS' if ok else 'CERT-FAIL'} {qname}: schema={bc == oc} "
          f"rows={len(brn)}/{len(orn)} hash={brn == orn}", flush=True)
    if not ok and bc == oc:
        diff_report(brn, orn)
    return ok


# ------------------------------------------------- per-replica (generic)

def replica_count(con, glob, rep_off):
    n = con.sql(
        f"SELECT CAST(max(doc_id) // {rep_off} AS INT) + 1 FROM read_parquet('{glob}')"
    ).fetchone()[0]
    if n is None:
        raise SystemExit(f"FAIL: empty documents slice at {glob}")
    return n


def bind_replica_view(con, glob, lo, hi, rep_off, view="documents"):
    con.execute(f"DROP VIEW IF EXISTS {view}")
    con.execute(
        f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{glob}') "
        f"WHERE doc_id >= {lo * rep_off} AND doc_id < {hi * rep_off}"
    )


def per_replica_oracle(con, glob, sql, rep_off=10_000_000, block_reps=100,
                       tag="blocked"):
    """Run `sql` over replica blocks of the documents slice, concatenated.
    Sound for the salted-slice queries whose derivations stay in-stride."""
    n_reps = replica_count(con, glob, rep_off)
    print(f"[{tag}] {n_reps} replicas, {block_reps} per block", flush=True)
    ocols, orows = None, []
    for lo in range(0, n_reps, block_reps):
        hi = min(lo + block_reps, n_reps)
        bind_replica_view(con, glob, lo, hi, rep_off)
        r = con.sql(sql)
        ocols = r.columns
        rows = r.fetchall()
        orows.extend(rows)
        print(f"[{tag}] reps [{lo},{hi}): {len(rows)} rows (total {len(orows)})",
              flush=True)
    return ocols, orows


# ------------------------------------------------------- q65 split replay

def q65_oracle(con, glob, rep_off=10_000_000, block_reps=100):
    """Blocked-signature / GLOBAL-band-join replay: the signature stage is
    per-document (replays in replica blocks with no argument needed); the
    band join must run one-shot because LSH chance collisions cross the
    salt. CTEs verbatim from the declared q65 oracle, split at sg."""
    n_reps = replica_count(con, glob, rep_off)
    print(f"[q65-blocked] {n_reps} replicas, {block_reps} per block", flush=True)
    con.execute("DROP TABLE IF EXISTS sigs")
    con.execute("CREATE TABLE sigs (doc_id BIGINT, sig BIGINT[])")
    for lo in range(0, n_reps, block_reps):
        hi = min(lo + block_reps, n_reps)
        bind_replica_view(con, glob, lo, hi, rep_off)
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
    r = con.sql("""
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
    return r.columns, r.fetchall()


# ------------------------------------------------------ q141 chunked replay

def q141_oracle(con, glob, assign_chunks=20, pair_chunks=10, cache=None,
                tag="q141", progress_every=10):
    """Chunked replay of the declared q141 oracle: label-mean centroids
    (one-shot), per-vector nearest-centroid argmax (chunked on vec_id),
    in-cluster epsilon-ball pairwise (chunked on cent_id — pairs never
    cross clusters). `cache` persists the assignment stage to parquet and
    validates it against the live slice (row count + id range) before
    reuse, so a pairwise retry doesn't redo the argmax."""
    import time
    t0 = time.time()
    con.execute("DROP VIEW IF EXISTS embeddings")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{glob}')")
    for t in ("c2", "e", "assigned", "ec_all", "drp"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
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
    print(f"[{tag}] cents done ({time.time() - t0:.0f}s)", flush=True)
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
    print(f"[{tag}] e done ({time.time() - t0:.0f}s)", flush=True)

    cached = False
    slice_fp = slice_fingerprint(glob)
    if cache and os.path.exists(cache) and _cache_load(con, cache, slice_fp, tag):
        want = con.sql("SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM e").fetchone()
        got = con.sql(
            f"SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM read_parquet('{cache}')"
        ).fetchone()
        if want == got:
            con.execute(f"CREATE TABLE assigned AS SELECT * FROM read_parquet('{cache}')")
            print(f"[{tag}] assigned loaded from cache ({time.time() - t0:.0f}s)", flush=True)
            cached = True
        else:
            print(f"[{tag}] assigned cache STALE (cache {got} != slice {want}) — recomputing",
                  flush=True)
    if not cached:
        con.execute("CREATE TABLE assigned (vec_id BIGINT, cent_id INT, ccos DOUBLE)")
        for k in range(assign_chunks):
            # ccos computed ONCE in a derived table that drops the embedding
            # lists BEFORE the window — the naive double-evaluated form
            # materialized the chunk's cross product with lists and OOM'd
            con.execute(f"""
            INSERT INTO assigned
            SELECT vec_id, cent_id, ccos FROM (
              SELECT vec_id, cent_id, ccos,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
              FROM (
                SELECT e.vec_id, c.cent_id,
                       (list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) AS ccos
                FROM e, c2 c
                WHERE e.vec_id % {assign_chunks} = {k}
              )
            ) WHERE crk = 1
            """)
            print(f"[{tag}] assign chunk {k + 1}/{assign_chunks} done ({time.time() - t0:.0f}s)",
                  flush=True)
        if cache:
            _cache_store(con, cache, slice_fp)

    # one join TOTAL attaches embeddings to assignments (the per-chunk
    # rebuild dominated wall-clock when done per pairwise chunk), with the
    # chunk key precomputed; pairs never cross clusters, so chunking on
    # cent_id stays result-identical.
    con.execute(f"""
    CREATE TABLE ec_all AS
    SELECT a.vec_id, a.cent_id, a.cent_id % {pair_chunks} AS ck, a.ccos, e.embedding, e.nrm
    FROM assigned a JOIN e ON a.vec_id = e.vec_id
    """)
    print(f"[{tag}] ec_all built ({time.time() - t0:.0f}s)", flush=True)
    con.execute("CREATE TABLE drp (vec_id BIGINT)")
    for k in range(pair_chunks):
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
        if (k + 1) % progress_every == 0 or k == pair_chunks - 1:
            print(f"[{tag}] pairwise chunk {k + 1}/{pair_chunks} done ({time.time() - t0:.0f}s)",
                  flush=True)
    con.execute("DROP TABLE IF EXISTS ec_all")
    r = con.sql("""
    SELECT a.vec_id, a.cent_id, round(a.ccos, 6) AS ccos, (d.vec_id IS NOT NULL) AS is_dropped
    FROM assigned a LEFT JOIN drp d USING (vec_id)
    ORDER BY a.vec_id
    """)
    return r.columns, r.fetchall()


# ------------------------------------------------- IVF-PQ chunked replays

# geometry/constants — must match graft.operators.Similarity
PQ_BLOCKS, PQ_BLOCK_DIM, PQ_CODES, PQ_SHORTLIST, NPROBE, DIM = 8, 8, 16, 50, 4, 64

LABEL_CENTS_SQL = f"""
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
"""

TRAINED_CENTS_SQL = f"""
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
"""


def pq_prepare(con, glob, pq_assign_chunks=4, tag="pq"):
    """Build e, blocks, the two-round PQ codebooks and the final codes —
    shared by q156/q161 (training never sees the coarse quantizer).
    gr/blocks one-shot, cb0/cb1 one-shot aggregations, pa1/enc chunked
    per-(vec,block) argmin (independent across vectors)."""
    import time
    t0 = time.time()
    con.execute("DROP VIEW IF EXISTS embeddings")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{glob}')")
    for t in ("e", "blocks", "cb0", "pa1", "cb1", "enc", "codes"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    con.execute("""
    CREATE TABLE e AS
    SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
    FROM embeddings
    """)
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
        con.execute(f"CREATE TABLE {dst} (vec_id BIGINT, b BIGINT, gvec BIGINT[], c INT)")
        for k in range(pq_assign_chunks):
            con.execute(f"""
            INSERT INTO {dst}
            SELECT vec_id, b, gvec, c FROM (
              SELECT s.vec_id, s.b, s.gvec, cb.c,
                     ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.b ORDER BY
                       list_sum(list_transform(range(1, {PQ_BLOCK_DIM} + 1),
                         i -> (s.gvec[i] - cb.cvec[i]) * (s.gvec[i] - cb.cvec[i]))) ASC, cb.c) AS crk
              FROM blocks s JOIN {cb} cb ON s.b = cb.b
              WHERE s.vec_id % {pq_assign_chunks} = {k}
            ) WHERE crk = 1
            """)
        print(f"[{tag}] {dst} done ({time.time() - t0:.0f}s)", flush=True)

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
    print(f"[{tag}] codes done ({time.time() - t0:.0f}s)", flush=True)


def pq_query_oracle(con, c2_sql, coarse_chunks=20, cache=None, tag="pq",
                    glob=None):
    """Coarse quantizer (one-shot c2), chunked per-vector coarse assign,
    one-shot probes + ADC shortlist + exact-rescore tail. Requires
    pq_prepare() to have built e/blocks/cb1/codes on this connection.
    `cache` persists/validates the coarse assignment (the q141 discipline);
    pass `glob` (the embeddings parquet glob) with it so the cache key
    includes the slice content fingerprint, not just the id range."""
    import time
    t0 = time.time()
    for t in ("c2", "assigned", "probes"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    con.execute(f"CREATE TABLE c2 AS {c2_sql}")
    cached = False
    slice_fp = slice_fingerprint(glob) if glob else "no-glob"
    if cache and os.path.exists(cache) and _cache_load(con, cache, slice_fp, tag):
        want = con.sql("SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM e").fetchone()
        got = con.sql(
            f"SELECT COUNT(*), MIN(vec_id), MAX(vec_id) FROM read_parquet('{cache}')"
        ).fetchone()
        if want == got:
            con.execute(f"CREATE TABLE assigned AS SELECT * FROM read_parquet('{cache}')")
            print(f"[{tag}] assigned loaded from cache", flush=True)
            cached = True
        else:
            print(f"[{tag}] assigned cache STALE (cache {got} != slice {want}) — recomputing",
                  flush=True)
    if not cached:
        con.execute("CREATE TABLE assigned (vec_id BIGINT, cent_id INT)")
        for k in range(coarse_chunks):
            con.execute(f"""
            INSERT INTO assigned
            SELECT vec_id, cent_id FROM (
              SELECT e.vec_id, c.cent_id,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       (list_sum(list_transform(range(1, {DIM} + 1), i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.nrm * c.cnrm)) DESC,
                       c.cent_id) AS crk
              FROM e, c2 c
              WHERE e.vec_id % {coarse_chunks} = {k}
            ) WHERE crk = 1
            """)
        if cache:
            _cache_store(con, cache, slice_fp)
    print(f"[{tag}] assigned done ({time.time() - t0:.0f}s)", flush=True)
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
    r = con.sql(f"""
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
    return r.columns, r.fetchall()
