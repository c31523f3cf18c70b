#!/usr/bin/env python3
"""LIFTED DuckDB oracle replay for q179_image_dedup_endgame at the sf100
rung (5.56M images), with built-in certification of the lift.

Why a lift: the declared q179 oracle computes the 8x8 average-hash in
closed form PER IMAGE — 64 sampled cells x 5.56M images = 356M gray rows
through a per-doc window SUM. One-shot at the 555k-image sf10 rung that
already costs ~680 s; at 5.56M it is hours of spill. Per-replica blocking
(check_sf100_docs.py) is UNSOUND here by construction: the slice is
unsalted and cross-replica hash equality is exactly what the exact-collapse
stage exploits.

The lift: the fixture raster is arithmetically periodic in doc_id —
  dims   = (d % 16 + 4, d % 12 + 4)            -> period 48
  pixel  = (d*31 + salt + k*7) % 256           -> period 256 in d
  joint period lcm(48, 256) = 768
so hash(d, salt) == hash(d % 768, salt) EXACTLY (no approximation: integer
identities (a mod 256)*31 mod 256 == a*31 mod 256 and 768 = 16*48 divisible
by 16 and 12). The lifted oracle computes the 64-cell hash for at most
768 x 2 (class, salt) pairs — ~98k cell rows instead of 356M — joins every
image to its class hash, and replays the REST of the declared oracle
verbatim (grp / rb / edges / sym / recursive reach / comp / verdict join),
which is linear-relational over one row per image.

Certification (run automatically before any grade unless --no-cert): on a
slice where the DECLARED one-shot SQL is feasible, the lifted replay must
reproduce its rows EXACTLY — schema, normalized values, order. The cert
slice is an UNSALTED 10-replica x fixture documents table in 10M id
strides (the sf100 slice construction in miniature), so classes genuinely
repeat across replicas and the exact-collapse crosses replica boundaries
through the lift join.

Usage:
  python3 tools/check_sf100_q179.py <sliceDir> <outDir> [--cert-fixture <sfDir>] [--no-cert]
"""
import json
import os
import sys
import time

import duckdb

from blocked_replay import connect, table_glob, compare_engine, compare_oracles

QNAME = "q179_image_dedup_endgame"

# the declared oracle's corpus + hash stages, lifted to (class, salt):
# identical arithmetic with base := cls (sound by the 768-periodicity
# argument in the module docstring), then hv re-derived per image by the
# class join. Everything after hv is the declared SQL verbatim.
LIFTED_SQL = """
WITH RECURSIVE imgs AS (
  SELECT doc_id, doc_id AS base, 0 AS salt FROM documents
  UNION ALL
  SELECT doc_id + 5000000, doc_id, 1 FROM documents WHERE doc_id % 9 = 0
), cls AS (
  SELECT DISTINCT base % 768 AS cb, salt FROM imgs
), dims AS (
  SELECT cb, salt, cb % 16 + 4 AS w, cb % 12 + 4 AS h FROM cls
), cells AS (
  SELECT cb, salt, g.g AS idx, w,
         ((g.g % 8) * w) // 8 AS x, ((g.g // 8) * h) // 8 AS y
  FROM dims, (SELECT unnest(range(0, 64)) AS g) g
), grays AS (
  SELECT cb, salt, idx,
         ((cb*31 + salt + ((y*w + x)*3    )*7) % 256
        + (cb*31 + salt + ((y*w + x)*3 + 1)*7) % 256
        + (cb*31 + salt + ((y*w + x)*3 + 2)*7) % 256) AS gray
  FROM cells
), bits AS (
  SELECT cb, salt, idx,
         CASE WHEN 64*gray > SUM(gray) OVER (PARTITION BY cb, salt) THEN 1 ELSE 0 END AS bit
  FROM grays
), clshash AS (
  SELECT cb, salt,
         CAST(SUM(CASE WHEN idx // 16 = 0 THEN bit * (1 << (idx % 16)) ELSE 0 END) AS BIGINT) AS k0,
         CAST(SUM(CASE WHEN idx // 16 = 1 THEN bit * (1 << (idx % 16)) ELSE 0 END) AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN idx // 16 = 2 THEN bit * (1 << (idx % 16)) ELSE 0 END) AS BIGINT) AS k2,
         CAST(SUM(CASE WHEN idx // 16 = 3 THEN bit * (1 << (idx % 16)) ELSE 0 END) AS BIGINT) AS k3
  FROM bits GROUP BY cb, salt
), hv AS (
  SELECT i.doc_id, c.k0, c.k1, c.k2, c.k3
  FROM imgs i JOIN clshash c ON c.cb = i.base % 768 AND c.salt = i.salt
), grp AS (
  SELECT k0, k1, k2, k3, MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
  FROM hv GROUP BY k0, k1, k2, k3
), rb AS (
  SELECT rep_id, b.b AS band,
         CASE b.b WHEN 0 THEN k0 WHEN 1 THEN k1 WHEN 2 THEN k2 ELSE k3 END AS key,
         k0, k1, k2, k3
  FROM grp, (SELECT unnest([0, 1, 2, 3]) AS b) b
), edges AS (
  SELECT DISTINCT a.rep_id AS id1, c.rep_id AS id2
  FROM rb a JOIN rb c ON a.band = c.band AND a.key = c.key AND a.rep_id < c.rep_id
  WHERE bit_count(xor(a.k0, c.k0)) + bit_count(xor(a.k1, c.k1))
      + bit_count(xor(a.k2, c.k2)) + bit_count(xor(a.k3, c.k3)) <= 6
), sym AS (
  SELECT id1 AS src, id2 AS dst FROM edges
  UNION
  SELECT id2, id1 FROM edges
), reach(node, r) AS (
  SELECT rep_id, rep_id FROM grp
  UNION
  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.node
), comp AS (
  SELECT node, MIN(r) AS comp FROM reach GROUP BY node
), rc AS (
  SELECT g.k0, g.k1, g.k2, g.k3, g.rep_id, g.n_copies, c.comp AS cluster_id
  FROM grp g JOIN comp c ON g.rep_id = c.node
), cm AS (
  SELECT cluster_id, CAST(SUM(n_copies) AS BIGINT) AS cluster_images
  FROM rc GROUP BY cluster_id
)
SELECT h.doc_id, rc.rep_id, rc.cluster_id, cm.cluster_images,
       h.doc_id = rc.cluster_id AS is_kept
FROM hv h
JOIN rc ON h.k0 = rc.k0 AND h.k1 = rc.k1 AND h.k2 = rc.k2 AND h.k3 = rc.k3
JOIN cm USING (cluster_id)
ORDER BY h.doc_id
"""

REP_OFF = 10_000_000
N_CERT_REPS = 10


def declared_sql(out_dir):
    return json.load(open(f"{out_dir}/oracle_sql.json"))[QNAME]


def bind_docs(con, glob_pat):
    con.execute("DROP VIEW IF EXISTS documents")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob_pat}')")


def certify(con, fixture_dir, sql_decl, work="/tmp/graft_cert_q179"):
    """Lifted == declared one-shot, on (a) the plain fixture table and
    (b) an UNSALTED 10-replica stride slice (classes repeat across
    replicas — the sf100 structural regime)."""
    fx = table_glob(fixture_dir, "documents")
    for label, setup in [
        ("fixture", lambda: bind_docs(con, fx)),
        ("unsalted-10rep", lambda: _bind_rep_slice(con, fx, work)),
    ]:
        setup()
        d = con.sql(sql_decl)
        dcols, drows = d.columns, d.fetchall()
        l = con.sql(LIFTED_SQL)
        lcols, lrows = l.columns, l.fetchall()
        ok = compare_oracles(f"cert_q179_lift_{label}", (lcols, lrows), (dcols, drows))
        if not ok:
            print(f"CERT-FAIL q179 lift on {label} — lift must not be used")
            sys.exit(1)
    print("CERT-PASS q179 lift (fixture + unsalted-10rep)")


def _bind_rep_slice(con, fx, work):
    os.makedirs(work, exist_ok=True)
    out = f"{work}/documents.parquet"
    if not os.path.exists(out):
        con.execute(f"""
        COPY (
          SELECT d.doc_id + t.rep * {REP_OFF} AS doc_id, d.text
          FROM read_parquet('{fx}') d,
               (SELECT unnest(range(0, {N_CERT_REPS})) AS rep) t
        ) TO '{out}' (FORMAT parquet)
        """)
    bind_docs(con, out)


def main():
    slice_dir, out_dir = sys.argv[1], sys.argv[2]
    cert_fixture = "/root/testdata/sf0.01"
    if "--cert-fixture" in sys.argv:
        cert_fixture = sys.argv[sys.argv.index("--cert-fixture") + 1]
    con = connect(mem="40GB", spill="/tmp/duck_q179_spill")
    sql_decl = declared_sql(out_dir)
    if "--no-cert" not in sys.argv:
        certify(con, cert_fixture, sql_decl)
    bind_docs(con, table_glob(slice_dir, "documents"))
    t0 = time.time()
    r = con.sql(LIFTED_SQL)
    ocols, orows = r.columns, r.fetchall()
    print(f"[q179-lift] oracle: {len(orows)} rows in {time.time() - t0:.1f} s",
          flush=True)
    ok = compare_engine(con, out_dir, QNAME, ocols, orows)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
