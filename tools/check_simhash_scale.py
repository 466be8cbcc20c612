#!/usr/bin/env python3
"""Scale-grade oracle compare for q_simhash (driver-side only).

`tools/check_correctness.py` runs the ledger's simhash oracle as ONE
DuckDB statement. Its signature stage materializes the per-token md5
stream for the whole corpus (rows = docs x tokens), and at mult=300
(1.5 M docs) that stream OOMs the process with allocations OUTSIDE the
buffer-manager budget (std::bad_alloc even at threads=4 +
memory_limit + spill) — the same cliff the embed-near-dup oracle hit
at mult=100 (fixed by tools/check_embed_scale.py's chunking). SimHash
signatures are PER-DOC independent, so this checker runs the
identical signature SQL on doc_id % NCHUNK slices (each slice is a
~mult=20-sized problem), persists the 4x16-bit block signatures to
parquet (doc_id + four smallints — tiny), then runs the block
self-join + Hamming verify over the assembled signature table and
compares with DuckDB-native EXCEPT ALL in both directions — exact,
dtype-strict, no pandas frame.

Mirrors queries/SimilarityQueries.scala's simhashOracle (keep in
sync): whitespace tokens, md5 nibble digit counts, 2*ones-n bit
majority (ties -> 0), MSB-first 64-bit signature folded into four
16-bit blocks, banded-pigeonhole candidates on block equality,
Hamming <= 3 verify.

usage: check_simhash_scale.py <sfDir> <outDir> [nchunk] [--stride N]
  sfDir   fixture dir with documents.parquet (file or Spark dir)
  outDir  graft.Verify dump dir containing q_simhash/
  --stride N: SUBSET mode — verify only the pair sub-block whose BOTH
    endpoints satisfy doc_id % N == 0 (signatures computed for the
    subset only, candidates mined within it, Spark dump filtered to
    it). The documented cutover for fixtures where the full compare
    outgrows the host's disk: signatures are per-doc independent and
    banding is per-signature, so the sub-block oracle is exactly the
    full oracle restricted — same invariance as the minhash subset
    checker, whose surgery VALIDATEs against the full oracle.
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import atexit
import os
import shutil
import sys
import tempfile
import time

import duckdb

if len(sys.argv) < 3:
    sys.exit(__doc__)
argv = list(sys.argv[1:])
STRIDE = 1
if "--stride" in argv:
    i = argv.index("--stride")
    STRIDE = int(argv[i + 1])
    del argv[i:i + 2]
sfdir, outdir = argv[0], argv[1]
NCHUNK = int(argv[2]) if len(argv) > 2 else 16

# Per-invocation private scratch dirs: a FIXED path here let two
# concurrent runs (verifying different fixtures) interleave their
# sigc_*.parquet chunks, and stage 2's glob would silently assemble a
# mixed signature table and report a bogus MATCH/MISMATCH.
TMP = tempfile.mkdtemp(prefix="simhash-scale-sigc-")
SPILL = tempfile.mkdtemp(prefix="duckdb-simhash-spill-")
# ... and each run cleans its own scratch (multi-GB at big mults — the
# per-invocation dirs otherwise accumulate in /tmp across gate runs).
atexit.register(lambda: shutil.rmtree(TMP, ignore_errors=True))
atexit.register(lambda: shutil.rmtree(SPILL, ignore_errors=True))
import signal
# atexit does not run on signals; route SIGTERM/SIGINT/SIGHUP through
# sys.exit so the spill-dir cleanup above fires (r17: a SIGTERM'd gate
# left a 60 GB spill dir).
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    signal.signal(_sig, lambda s, f: sys.exit(128 + s))

p = f"{sfdir}/documents.parquet"
DOCS = f"{p}/*.parquet" if os.path.isdir(p) else p


def fresh_connection():
    c = duckdb.connect()
    c.sql("SET threads=8")
    c.sql("SET memory_limit='40GB'")
    os.makedirs(SPILL, exist_ok=True)
    c.sql(f"SET temp_directory='{SPILL}'")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        c.sql(f"SET memory_limit='{mem}'")
    c.sql("SET preserve_insertion_order=false")
    return c


# stage 1: per-chunk signature computation (the memory-heavy part —
# rows = docs x tokens — bounded to a 1/NCHUNK slice per connection).
# SQL is the ledger oracle's signature pipeline verbatim, restricted
# to the chunk's documents; the list_transform lambda variable is
# renamed q to keep this file greppable for the chunk var k.
SIG_SQL = r"""
WITH docs AS MATERIALIZED (
    SELECT doc_id, text FROM read_parquet('{docs}')
    WHERE doc_id % {stride} = 0 AND (doc_id // {stride}) % {n} = {k}),
  tb AS MATERIALIZED (
    SELECT doc_id, md5(tok) AS mh FROM
      (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text,
        '\s+'), t -> len(t) > 0)) AS tok FROM docs)),
  ntok AS (SELECT doc_id, count(*) AS n FROM tb GROUP BY 1),
  digc AS (
    SELECT doc_id, p.p AS pos,
      instr('0123456789abcdef', substr(mh, p.p + 1, 1)) - 1 AS dv,
      count(*) AS cnt
    FROM tb, (SELECT unnest(generate_series(0, 15)) AS p) p
    GROUP BY 1, 2, 3),
  bitones AS (
    SELECT doc_id, 60 - 4 * pos + b.b AS j,
      sum(CASE WHEN (dv // CAST(power(2, b.b) AS BIGINT)) % 2 = 1
        THEN cnt ELSE 0 END) AS ones
    FROM digc, (SELECT unnest(generate_series(0, 3)) AS b) b
    GROUP BY 1, 2),
  bits AS (
    SELECT d.doc_id, j.j AS j,
      coalesce(2 * bo.ones - nt.n, 0) AS c
    FROM docs d
    CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) j
    LEFT JOIN bitones bo ON bo.doc_id = d.doc_id AND bo.j = j.j
    LEFT JOIN ntok nt ON nt.doc_id = d.doc_id),
  sig AS MATERIALIZED (
    SELECT doc_id,
      list(CASE WHEN c > 0 THEN 1 ELSE 0 END ORDER BY j) AS bv
    FROM bits GROUP BY doc_id),
  blocks AS (
    SELECT doc_id, i.i AS blk,
      CAST(list_sum(list_transform(generate_series(1, 16),
        q -> bv[16 * i.i + q] * CAST(power(2, q - 1) AS BIGINT)))
        AS BIGINT) AS v
    FROM sig, (SELECT unnest(generate_series(0, 3)) AS i) i)
SELECT doc_id,
  max(CASE WHEN blk = 0 THEN v END) AS v0,
  max(CASE WHEN blk = 1 THEN v END) AS v1,
  max(CASE WHEN blk = 2 THEN v END) AS v2,
  max(CASE WHEN blk = 3 THEN v END) AS v3
FROM blocks GROUP BY doc_id
"""

t0 = time.time()
for k in range(NCHUNK):
    con = fresh_connection()
    sql = SIG_SQL.format(docs=DOCS, n=NCHUNK, k=k, stride=STRIDE)
    con.sql(f"COPY ({sql}) TO '{TMP}/sigc_{k}.parquet' (FORMAT parquet)")
    con.close()
    print(f"[simhash-scale] chunk {k + 1}/{NCHUNK} sigs done "
          f"({time.time() - t0:.0f}s)", flush=True)

# stage 2: candidates + verify over the assembled signature table
# (1 row per doc — small at any measured mult), then EXCEPT ALL both
# directions against the Spark dump.
con = fresh_connection()
con.sql(f"""CREATE VIEW sigc AS
    SELECT * FROM read_parquet('{TMP}/sigc_*.parquet')""")
con.sql("""CREATE TABLE want AS
    WITH blocks AS MATERIALIZED (
        SELECT doc_id, i.i AS blk,
          CASE i.i WHEN 0 THEN v0 WHEN 1 THEN v1 WHEN 2 THEN v2
            ELSE v3 END AS v
        FROM sigc, (SELECT unnest(generate_series(0, 3)) AS i) i),
      cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM blocks x JOIN blocks y
          ON x.blk = y.blk AND x.v = y.v AND x.doc_id < y.doc_id)
    SELECT a, b, CAST(
        bit_count(xor(sa.v0, sb.v0)) + bit_count(xor(sa.v1, sb.v1)) +
        bit_count(xor(sa.v2, sb.v2)) + bit_count(xor(sa.v3, sb.v3))
        AS INTEGER) AS dist
    FROM cand
    JOIN sigc sa ON a = sa.doc_id
    JOIN sigc sb ON b = sb.doc_id
    WHERE CAST(
        bit_count(xor(sa.v0, sb.v0)) + bit_count(xor(sa.v1, sb.v1)) +
        bit_count(xor(sa.v2, sb.v2)) + bit_count(xor(sa.v3, sb.v3))
        AS INTEGER) <= 3""")
con.sql(f"""CREATE VIEW got AS
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
      CAST(dist AS INTEGER) AS dist
    FROM read_parquet('{outdir}/q_simhash/*.parquet')
    WHERE a % {STRIDE} = 0 AND b % {STRIDE} = 0""")
nw = con.sql("SELECT count(*) FROM want").fetchone()[0]
ng = con.sql("SELECT count(*) FROM got").fetchone()[0]
d1 = con.sql(
    "SELECT count(*) FROM (SELECT * FROM want EXCEPT ALL "
    "SELECT * FROM got)").fetchone()[0]
d2 = con.sql(
    "SELECT count(*) FROM (SELECT * FROM got EXCEPT ALL "
    "SELECT * FROM want)").fetchone()[0]
print(f"[simhash-scale] stride={STRIDE} TOTAL want {nw}, got {ng}, "
      f"want-got {d1}, got-want {d2} ({time.time() - t0:.0f}s)")
if nw == ng and d1 == 0 and d2 == 0:
    print("MATCH")
    sys.exit(0)
print("MISMATCH")
sys.exit(1)
