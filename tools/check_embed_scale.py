#!/usr/bin/env python3
"""Scale-grade oracle compare for q_embed_neardup (driver-side only).

`tools/check_correctness.py` verifies every ledger query with a strict
pandas frame compare — fine up to ~10^5-row results, but at mult=100
(~sf10) q_embed_neardup's TRUE answer is ~9.7M pairs and the oracle's
naive single-shot SQL spills >43 GB: the 16-band collision join emits
~1.25 B pair rows (multi-band multiplicity ~13x) and DuckDB
materializes the stream for the verify join / final DISTINCT.

This checker runs the SAME oracle semantics (identical hyperplane
derivation, quantized cosine, threshold) chunked on a = vec_id % 8:
each chunk DISTINCTs its ~1/8 of the pair stream in RAM (16-byte
keys, no 64-element lists), so the 64-element dot runs once per
UNIQUE pair, nothing spills, and the compare is DuckDB-native
EXCEPT ALL in both directions — exact, dtype-strict, no pandas frame.

usage: check_embed_scale.py <sfDir> <outDir> [nchunk]
  sfDir   fixture dir with embeddings.parquet (file or Spark dir)
  outDir  graft.Verify dump dir containing q_embed_neardup/
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import os
import sys
import time

import duckdb

if len(sys.argv) < 3:
    sys.exit(__doc__)
sfdir, outdir = sys.argv[1], sys.argv[2]
NCHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 8

con = duckdb.connect()
con.sql("SET memory_limit='85GB'")
con.sql("SET temp_directory='/tmp/duckdbtmp'")
con.sql("SET preserve_insertion_order=false")
p = f"{sfdir}/embeddings.parquet"
pat = f"{p}/*.parquet" if os.path.isdir(p) else p
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{pat}'")


def dot(a, b):
    return f"""list_sum(list_transform(generate_series(1, 64),
       k -> CAST({a}[k] AS DOUBLE) * CAST({b}[k] AS DOUBLE)))"""


t0 = time.time()
# Identical plane derivation to expressions/HyperplaneBands.scala:
# md5("hp:<seed>:<band>:<bit>:0"), hex digit d bit (3 - k%4) selects
# the sign of component k — 16 bands x 8 bits, seed 42.
con.sql("""CREATE TEMP TABLE planesig AS
    SELECT tb.band, ti.bit,
      md5('hp:42:' || tb.band || ':' || ti.bit || ':0') AS dg
    FROM generate_series(0, 15) tb(band),
         generate_series(0, 7) ti(bit)""")
con.sql("""CREATE TEMP TABLE bands AS
    SELECT vec_id, band,
      CAST(sum(CASE WHEN s >= 0
        THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
        ELSE 0 END) AS BIGINT) AS h
    FROM (
      SELECT e.vec_id, p.band, p.bit,
        list_sum(list_transform(generate_series(1, 64), k ->
          CASE WHEN ((instr('0123456789abcdef',
                substr(p.dg, CAST(1 + (k - 1) // 4 AS INTEGER), 1)) - 1)
              >> CAST(3 - ((k - 1) % 4) AS INTEGER)) & 1 = 1
            THEN CAST(e.embedding[k] AS DOUBLE)
            ELSE -CAST(e.embedding[k] AS DOUBLE) END)) AS s
      FROM embeddings e CROSS JOIN planesig p) t
    GROUP BY 1, 2""")
con.sql(f"""CREATE TEMP TABLE vecs AS
    SELECT vec_id, embedding, sqrt({dot('embedding', 'embedding')}) AS nrm
    FROM embeddings""")
print(f"signatures+vecs: {time.time() - t0:.1f}s", flush=True)

con.sql(f"CREATE TEMP VIEW got AS SELECT * FROM "
        f"read_parquet('{outdir}/q_embed_neardup/*.parquet')")

tot_want = tot_d1 = tot_d2 = 0
for i in range(NCHUNK):
    t1 = time.time()
    con.sql(f"""CREATE OR REPLACE TEMP TABLE want_c AS
        WITH cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.h = y.h AND x.vec_id < y.vec_id
          WHERE x.vec_id % {NCHUNK} = {i})
        SELECT a, b, score_q / 10000 AS score FROM (
          SELECT c.a, c.b,
            CAST(floor(({dot('ex.embedding', 'ey.embedding')} /
              (ex.nrm * ey.nrm)) * 10000 + 0.5) AS BIGINT) AS score_q
          FROM cand c
          JOIN vecs ex ON ex.vec_id = c.a
          JOIN vecs ey ON ey.vec_id = c.b) t
        WHERE score_q >= 4000""")
    w = con.sql("SELECT count(*) FROM want_c").fetchone()[0]
    d1 = con.sql(f"""SELECT count(*) FROM (
        SELECT * FROM got WHERE a % {NCHUNK} = {i}
        EXCEPT ALL SELECT * FROM want_c)""").fetchone()[0]
    d2 = con.sql(f"""SELECT count(*) FROM (
        SELECT * FROM want_c EXCEPT ALL
        SELECT * FROM got WHERE a % {NCHUNK} = {i})""").fetchone()[0]
    tot_want += w
    tot_d1 += d1
    tot_d2 += d2
    print(f"chunk {i}: want {w}, got-want {d1}, want-got {d2} "
          f"({time.time() - t1:.1f}s)", flush=True)

nrows = con.sql("SELECT count(*) FROM got").fetchone()[0]
print(f"TOTAL want {tot_want}, got {nrows}, "
      f"got-want {tot_d1}, want-got {tot_d2}")
ok = tot_d1 == 0 and tot_d2 == 0 and tot_want == nrows
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
