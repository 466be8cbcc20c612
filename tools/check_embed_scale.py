#!/usr/bin/env python3
"""Scale-grade oracle compare for q_embed_neardup_auto (driver-side only).

`tools/check_correctness.py` verifies every ledger query with a strict
pandas frame compare — fine up to ~10^5-row results, but at the big
mult fixtures the embedding near-dup answer is millions of pairs and a
single-shot SQL materializes the whole multi-band collision stream
(the r13 fixed-16x8 form spilled >43 GB at mult=100). This checker
runs the SAME oracle semantics chunked on a = vec_id % NCHUNK: each
chunk DISTINCTs its slice of the pair stream in RAM (16-byte keys, no
64-element lists), the 64-element dot runs once per UNIQUE pair, and
the compare is DuckDB-native EXCEPT ALL in both directions — exact,
dtype-strict, no pandas frame.

Mirrors queries/SimilarityQueries.scala's q_embed_neardup_auto oracle
(keep in sync):
 - corpus AUGMENTED with planted clones: every CloneStride-th vec_id
   re-emitted as vec_id + CloneIdOffset with component 1 negated;
 - band scheme sized by Ann.lshPlan's algebra FROM THE AUGMENTED
   COUNT (bits = clamp(ceil(log2(n/256)), 6..24); bands from the
   banding recall formula at threshold 0.95 target 0.999 capped at
   64, stepping bits down when the cap binds) — recomputed here in
   SQL, never taken from the Spark side;
 - md5-derived ±1 planes 'hp:42:<band>:<bit>:0', quantized-cosine
   verify at score_q >= 9500.

usage: check_embed_scale.py <sfDir> <outDir> [nchunk]
  sfDir   fixture dir with embeddings.parquet (file or Spark dir)
  outDir  graft.Verify dump dir containing q_embed_neardup_auto/
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import os
import sys
import time

import duckdb

if len(sys.argv) < 3:
    sys.exit(__doc__)
argv = list(sys.argv[1:])
MAX_CHUNKS = None
if "--max-chunks" in argv:
    # SUBSET mode (the documented big-mult cutover, mirroring the
    # minhash/simhash subset checkers): verify only the first K of the
    # NCHUNK id-slices — an exact both-direction compare of the pairs
    # whose SMALLER id falls in those slices, plus the per-slice count
    # parity. The full-compare certification stands at the largest
    # fixture where it fits (mult=300: 60,804,000 pairs, zero diffs).
    i = argv.index("--max-chunks")
    MAX_CHUNKS = int(argv[i + 1])
    del argv[i:i + 2]
sfdir, outdir = argv[0], argv[1]
NCHUNK = int(argv[2]) if len(argv) > 2 else 8

CLONE_STRIDE = 50
CLONE_ID_OFFSET = 100000000001
THRESHOLD = 0.95
THRESHOLD_Q = 9500

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '85GB')}'")
con.sql("SET temp_directory='/tmp/duckdbtmp'")
con.sql("SET preserve_insertion_order=false")
p = f"{sfdir}/embeddings.parquet"
pat = f"{p}/*.parquet" if os.path.isdir(p) else p
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{pat}'")
con.sql(f"""CREATE VIEW aug AS
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {CLONE_ID_OFFSET} AS vec_id,
      list_concat([-embedding[1]], embedding[2:64]) AS embedding
    FROM embeddings WHERE vec_id % {CLONE_STRIDE} = 0""")


def dot(a, b):
    return f"""list_sum(list_transform(generate_series(1, 64),
       k -> CAST({a}[k] AS DOUBLE) * CAST({b}[k] AS DOUBLE)))"""


t0 = time.time()
# Plan sizing IN SQL — the identical algebra the ledger oracle runs
# (and q_lsh_plan pins cross-engine), so this checker certifies the
# sizing decision at scale too, not just the pair mining.
bits, bands = con.sql(f"""
    WITH nn AS (SELECT count(*) AS n FROM aug),
    pp AS (SELECT 1.0 - acos({THRESHOLD}) / pi() AS p),
    sized AS (
      SELECT CAST(bs.bits AS INTEGER) AS bits,
        CASE WHEN power(pp.p, bs.bits) >= 1.0 THEN 1
          ELSE least(64, greatest(1, CAST(ceil(
            ln(1.0 - 0.999) / ln(1.0 - power(pp.p, bs.bits)))
            AS INTEGER))) END AS bands
      FROM pp, generate_series(6, 24) bs(bits)),
    sized2 AS (
      SELECT s.bits, s.bands,
        1.0 - power(1.0 - power(pp.p, s.bits), s.bands) AS recall
      FROM sized s, pp),
    init AS (
      SELECT least(24, greatest(6, CAST(ceil(
        ln(greatest(1.0, CAST(nn.n AS DOUBLE) / 256.0)) / ln(2.0))
        AS INTEGER))) AS initbits
      FROM nn)
    SELECT s.bits, s.bands FROM sized2 s
    WHERE s.bits = coalesce(
      (SELECT max(x.bits) FROM sized2 x, init i
       WHERE x.bits <= i.initbits AND x.recall >= 0.999),
      CAST(6 AS INTEGER))""").fetchone()
n = con.sql("SELECT count(*) FROM aug").fetchone()[0]
print(f"plan: n={n} bits={bits} bands={bands}", flush=True)

# Identical plane derivation to expressions/HyperplaneBands.scala:
# md5("hp:<seed>:<band>:<bit>:0"), hex digit d bit (3 - k%4) selects
# the sign of component k — plan-sized bands x bits, seed 42.
con.sql(f"""CREATE TEMP TABLE planesig AS
    SELECT tb.band, ti.bit,
      md5('hp:42:' || tb.band || ':' || ti.bit || ':0') AS dg
    FROM generate_series(0, {bands - 1}) tb(band),
         generate_series(0, {bits - 1}) ti(bit)""")
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
      FROM aug e CROSS JOIN planesig p) t
    GROUP BY 1, 2""")
con.sql(f"""CREATE TEMP TABLE vecs AS
    SELECT vec_id, embedding, sqrt({dot('embedding', 'embedding')}) AS nrm
    FROM aug""")
print(f"signatures+vecs: {time.time() - t0:.1f}s", flush=True)

con.sql(f"CREATE TEMP VIEW got AS SELECT * FROM "
        f"read_parquet('{outdir}/q_embed_neardup_auto/*.parquet')")

tot_want = tot_d1 = tot_d2 = 0
for i in range(MAX_CHUNKS if MAX_CHUNKS else NCHUNK):
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
        WHERE score_q >= {THRESHOLD_Q}""")
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

if MAX_CHUNKS:
    # subset mode: got-side rows comparable only within the checked
    # slices (counted per chunk above via the EXCEPTs); global count
    # parity is NOT asserted here — the full compare owns that claim
    nrows = con.sql(f"""SELECT count(*) FROM got
        WHERE a % {NCHUNK} < {MAX_CHUNKS}""").fetchone()[0]
    print(f"SUBSET {MAX_CHUNKS}/{NCHUNK} slices: want {tot_want}, "
          f"got-in-slices {nrows}, got-want {tot_d1}, want-got {tot_d2}")
else:
    nrows = con.sql("SELECT count(*) FROM got").fetchone()[0]
    print(f"TOTAL want {tot_want}, got {nrows}, "
          f"got-want {tot_d1}, want-got {tot_d2}")
ok = tot_d1 == 0 and tot_d2 == 0 and tot_want == nrows
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
