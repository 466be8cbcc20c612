#!/usr/bin/env python3
"""Scale-grade oracle compare for q_neardup_components (driver-side only).

The ledger oracle derives the DF-capped shingle-join Jaccard pair graph
(fine — the same machinery q_ngram_jaccard's compare certifies) and then
labels components with a RECURSIVE min-reachable-id CTE, which
materializes O(c^2) reach rows per c-member component — the quadratic
blowup the engine's own min-label-propagation operator exists to avoid.
At mult=1000 the combined query OOM-kills DuckDB. This checker re-derives
the SAME semantics with a linear toolchain:

 - DuckDB runs the ledger oracle's `pairs` CTE TEXT VERBATIM (4-gram
   shingles, df<=50 candidate cap, exact-Jaccard >= 0.8 verify) and
   returns only the (a, b) edge list;
 - the connected components over those edges run in PYTHON via
   union-find (path compression + union by min id) — an independent
   implementation of the consolidation, O(E alpha);
 - the (doc_id, component_id) labeling is compared against the Spark
   dump with DuckDB EXCEPT ALL in both directions — exact, dtype-strict.

Note the oracle (and the engine) labels ONLY docs that appear in at
least one edge — min(lab) over the reach closure of the edge list —
so isolated docs are absent from both sides by construction.

Mirrors queries/SimilarityQueries.scala q_neardup_components (keep the
pairs CTE verbatim in sync with the ledger oracle_sql entry).

usage: check_components_scale.py <sfDir> <outDir>
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import json
import os
import shutil
import sys
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

if len(sys.argv) < 3:
    sys.exit(__doc__)
sfdir, outdir = sys.argv[1], sys.argv[2]

SPILL_DIR = f"/tmp/duckdb-components-spill-{os.getpid()}"
import atexit
atexit.register(shutil.rmtree, SPILL_DIR, ignore_errors=True)
import signal
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    signal.signal(_sig, lambda s, f: sys.exit(128 + s))

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '80GB')}'")
os.makedirs(SPILL_DIR, exist_ok=True)
con.sql(f"SET temp_directory='{SPILL_DIR}'")
con.sql("SET threads=16")
con.sql("SET preserve_insertion_order=false")

docs = f"{sfdir}/documents.parquet"
pat = f"{docs}/*.parquet" if os.path.isdir(docs) else docs
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")

# The ledger oracle's pair derivation, verbatim (q_neardup_components's
# `pairs` CTE = q_ngram_jaccard's certified machinery), projected to the
# edge list only.
t0 = time.time()
edges = con.sql(r"""
  WITH docs AS (
      SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - 4, 0)),
        i -> list_aggregate(toks[i:i+4], 'string_agg', ' '))) AS sh
      FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        t -> len(t) > 0) AS toks FROM documents)),
    sh0 AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    sh AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh0)
      WHERE df <= 50),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id),
    scored AS (
      SELECT a, b, len(list_intersect(da.sh, db.sh)) AS inter,
        len(da.sh) AS na, len(db.sh) AS nb
      FROM cand
      JOIN docs da ON a = da.doc_id
      JOIN docs db ON b = db.doc_id)
    SELECT a, b FROM scored
    WHERE CAST(floor((CAST(inter AS DOUBLE) / (na + nb - inter)) * 10000
      + 0.5) AS BIGINT) >= 8000""").fetchall()
print(f"[components] {len(edges)} verified edges "
      f"in {time.time() - t0:.1f}s", flush=True)

parent = {}


def find(x):
    r = x
    while parent[r] != r:
        r = parent[r]
    while parent[x] != r:
        parent[x], x = r, parent[x]
    return r


for a, b in edges:
    if a not in parent:
        parent[a] = a
    if b not in parent:
        parent[b] = b
    ra, rb = find(a), find(b)
    if ra != rb:
        # union by min id: the root IS the component label (min doc_id)
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

labels = sorted((d, find(d)) for d in parent)
oracle_pq = f"{SPILL_DIR}/components_oracle.parquet"
pq.write_table(pa.table({
    "doc_id": pa.array([d for d, _ in labels], pa.int64()),
    "component_id": pa.array([c for _, c in labels], pa.int64()),
}), oracle_pq)

spark_pat = f"{outdir}/q_neardup_components/*.parquet"
n_spark = con.sql(f"SELECT count(*) FROM '{spark_pat}'").fetchone()[0]
n_oracle = len(labels)
d1 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{spark_pat}' "
             f"EXCEPT ALL SELECT * FROM '{oracle_pq}')").fetchone()[0]
d2 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{oracle_pq}' "
             f"EXCEPT ALL SELECT * FROM '{spark_pat}')").fetchone()[0]
ok = n_spark == n_oracle and d1 == 0 and d2 == 0
print(f"[components] spark={n_spark} oracle={n_oracle} "
      f"spark-minus-oracle={d1} oracle-minus-spark={d2} "
      f"({time.time() - t0:.1f}s)")
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
