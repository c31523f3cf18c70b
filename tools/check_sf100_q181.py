#!/usr/bin/env python3
"""LIFTED + WINDOW-FORM DuckDB oracle replay for q181_image_stream_gate at
the sf100 rung (5.56M images), with built-in certification.

Two independent rewrites of the declared oracle, each exact:

  1. HASH LIFT (the check_sf100_q179.py argument, same arithmetic): the
     closed-form raster is periodic in doc_id with period lcm(48,256)=768,
     so the per-image band keys reduce to <=768x2 (class, salt) hashes
     joined back by class — the 356M-cell-row hash stage becomes ~100k
     rows.
  2. ARRIVAL WINDOW FORM: the declared fm joins every image's band row to
     ALL earlier same-bucket claimants — quadratic in bucket size, and the
     unsalted rung's buckets hold ~7,200 same-class images each. The
     rewrite: prior(b) = MIN(doc_id) OVER (PARTITION BY band, key ORDER BY
     ep, doc_id ROWS UNBOUNDED PRECEDING TO 1 PRECEDING) — the registry's
     running minimum, linear per bucket. first_match(b) = MIN over bands of
     prior when prior < doc_id, which equals the declared MIN over all
     qualifying claimants: the bucket minimum M qualifies iff M < b.id, and
     if M >= b.id no earlier claimant in that bucket can qualify (all have
     id >= M).

Certification (automatic unless --no-cert): on slices where the DECLARED
join-form SQL is feasible — the plain fixture table and an unsalted
10-replica stride slice (cross-replica hash equality live, the rung's
structural regime) — the lifted window replay must reproduce the declared
rows EXACTLY.

Usage:
  python3 tools/check_sf100_q181.py <sliceDir> <outDir> [--cert-fixture <sfDir>] [--no-cert]
"""
import json
import sys
import time

from blocked_replay import connect, table_glob, compare_engine, compare_oracles
from check_sf100_q179 import bind_docs, _bind_rep_slice

QNAME = "q181_image_stream_gate"

LIFTED_SQL = """
WITH imgs AS (
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
), clsbands AS (
  SELECT cb, salt, idx // 16 AS band,
         CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS key
  FROM bits GROUP BY cb, salt, idx // 16
), wb AS (
  SELECT i.doc_id, (i.doc_id % 7) % 4 AS ep, c.band, c.key
  FROM imgs i JOIN clsbands c ON c.cb = i.base % 768 AND c.salt = i.salt
), prior AS (
  SELECT doc_id, band,
         MIN(doc_id) OVER (PARTITION BY band, key ORDER BY ep, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_id
  FROM wb
), fm AS (
  SELECT doc_id,
         MIN(CASE WHEN prior_id < doc_id THEN prior_id END) AS first_match
  FROM prior GROUP BY doc_id
)
SELECT i.doc_id, fm.first_match, fm.first_match IS NOT NULL AS is_dup_at_arrival
FROM imgs i LEFT JOIN fm USING (doc_id)
ORDER BY i.doc_id
"""


def certify(con, fixture_dir, sql_decl, work="/tmp/graft_cert_q181"):
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
        ok = compare_oracles(f"cert_q181_lift_{label}", (lcols, lrows), (dcols, drows))
        if not ok:
            print(f"CERT-FAIL q181 lift on {label} — lift must not be used")
            sys.exit(1)
    print("CERT-PASS q181 lift (fixture + unsalted-10rep)")


def main():
    slice_dir, out_dir = sys.argv[1], sys.argv[2]
    cert_fixture = "/root/testdata/sf0.01"
    if "--cert-fixture" in sys.argv:
        cert_fixture = sys.argv[sys.argv.index("--cert-fixture") + 1]
    con = connect(mem="40GB", spill="/tmp/duck_q181_spill")
    sql_decl = json.load(open(f"{out_dir}/oracle_sql.json"))[QNAME]
    if "--no-cert" not in sys.argv:
        certify(con, cert_fixture, sql_decl)
    bind_docs(con, table_glob(slice_dir, "documents"))
    t0 = time.time()
    r = con.sql(LIFTED_SQL)
    ocols, orows = r.columns, r.fetchall()
    print(f"[q181-lift] oracle: {len(orows)} rows in {time.time() - t0:.1f} s",
          flush=True)
    ok = compare_engine(con, out_dir, QNAME, ocols, orows)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
