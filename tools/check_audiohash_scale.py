#!/usr/bin/env python3
"""Scale-grade oracle compare for q_media_audiohash (driver-side only).

The ledger oracle unnests ~850M synthetic samples (1.67M docs x ~524
each) through one generate_series pass; at mult=1000 DuckDB dies on it
regardless of cap (OOM at 40/80GB, instant segfault at 100GB) — the
failure is the checker's single-pass form, not the operator's. Per-doc
`ahash` is SELF-CONTAINED (synthesized from doc_id and n_chars alone),
so this checker runs the IDENTICAL oracle CTEs restricted to
`doc_id % CHUNKS = k` slices — same SQL text, same arithmetic, same
string_agg ordering — accumulating (doc_id, ahash) per chunk. The final
n_same / rep_id window functions are global, so they run once over the
accumulated 1.67M-row hash table (trivial), then EXCEPT ALL both
directions against the Spark dump — exact, dtype-strict.

Mirrors queries/PipelineQueries.scala q_media_audiohash (keep the CTEs
verbatim in sync with the ledger oracle_sql entry).

usage: check_audiohash_scale.py <sfDir> <outDir> [chunks]
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import os
import shutil
import sys
import time

import duckdb

if len(sys.argv) < 3:
    sys.exit(__doc__)
sfdir, outdir = sys.argv[1], sys.argv[2]
CHUNKS = int(sys.argv[3]) if len(sys.argv) > 3 else 24

SPILL_DIR = f"/tmp/duckdb-audiohash-spill-{os.getpid()}"
import atexit
atexit.register(shutil.rmtree, SPILL_DIR, ignore_errors=True)
import signal
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    signal.signal(_sig, lambda s, f: sys.exit(128 + s))

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '30GB')}'")
os.makedirs(SPILL_DIR, exist_ok=True)
con.sql(f"SET temp_directory='{SPILL_DIR}'")
con.sql("SET threads=16")

docs = f"{sfdir}/documents.parquet"
pat = f"{docs}/*.parquet" if os.path.isdir(docs) else docs

con.sql("CREATE TABLE hs_all (doc_id BIGINT, ahash VARCHAR)")
t0 = time.time()
for k in range(CHUNKS):
    # Identical CTE text to the ledger oracle, plus the chunk predicate.
    con.sql(f"""
      INSERT INTO hs_all
      WITH m AS (SELECT doc_id, n_chars + 16 AS n
            FROM '{pat}'
            WHERE doc_id % 3 = 1 AND doc_id % {CHUNKS} = {k}),
          sm AS (SELECT doc_id, i * 64 // n AS w,
              abs((doc_id * 31 + i * 7) % 4096 - 2048) AS a
            FROM m, unnest(generate_series(0, n - 1)) AS t(i)),
          bk AS (SELECT doc_id, w, sum(a) AS bs, count(*) AS bn
            FROM sm GROUP BY 1, 2),
          tot AS (SELECT doc_id, sum(bs) AS ts, sum(bn) AS tn
            FROM bk GROUP BY 1)
      SELECT b.doc_id,
          string_agg(CASE WHEN b.bs * t.tn > t.ts * b.bn
            THEN '1' ELSE '0' END, '' ORDER BY b.w) AS ahash
        FROM bk b JOIN tot t USING (doc_id) GROUP BY b.doc_id""")
    print(f"[audiohash] chunk {k + 1}/{CHUNKS} "
          f"({time.time() - t0:.1f}s)", flush=True)

n_oracle = con.sql("SELECT count(*) FROM hs_all").fetchone()[0]
con.sql("""
  CREATE TABLE oracle AS
  SELECT doc_id AS media_id, ahash,
      CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same,
      CAST(min(doc_id) OVER (PARTITION BY ahash) AS BIGINT) AS rep_id
    FROM hs_all""")

spark_pat = f"{outdir}/q_media_audiohash/*.parquet"
n_spark = con.sql(f"SELECT count(*) FROM '{spark_pat}'").fetchone()[0]
d1 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{spark_pat}' "
             "EXCEPT ALL SELECT * FROM oracle)").fetchone()[0]
d2 = con.sql("SELECT count(*) FROM (SELECT * FROM oracle "
             f"EXCEPT ALL SELECT * FROM '{spark_pat}')").fetchone()[0]
ok = n_spark == n_oracle and d1 == 0 and d2 == 0
print(f"[audiohash] spark={n_spark} oracle={n_oracle} "
      f"spark-minus-oracle={d1} oracle-minus-spark={d2} "
      f"({time.time() - t0:.1f}s)")
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
