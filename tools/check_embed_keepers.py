#!/usr/bin/env python3
"""Scale-grade oracle compare for q_embed_keepers_auto (driver-side only).

The ledger oracle (recursive min-reachable-id CTE) is exact but its
fixpoint materializes O(c^2) reach rows per c-member duplicate
component — at mult=1000 the clone fixture's ~994-member components
make that ~2e9 rows, which is exactly the quadratic the keeper-direct
operator exists to avoid. This checker re-derives the SAME semantics
with a linear toolchain:

 - DuckDB recomputes the clone-augmented corpus, the lshPlan sizing
   algebra FROM ITS OWN count, the md5 plane family, the per-band
   bucket hashes (chunked on vec_id so no single signature pass holds
   the whole corpus), the window-min STAR candidates and the
   quantized-cosine verify — identical to the ledger oracle's CTEs;
 - the connected components over the verified star edges run in
   PYTHON via union-find (path compression + union by min id) — an
   independent third implementation of the consolidation, O(E alpha);
 - the (vec_id, keeper_id) assignment is compared against the Spark
   dump with DuckDB EXCEPT ALL in both directions — exact, dtype-strict.

Mirrors queries/SimilarityQueries.scala's q_embed_keepers_auto oracle
(keep in sync with embedAutoBandsCtes / the star cand CTE).

usage: check_embed_keepers.py <sfDir> <outDir> [sig_chunks]
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import os
import sys
import time

import duckdb

if len(sys.argv) < 3:
    sys.exit(__doc__)
sfdir, outdir = sys.argv[1], sys.argv[2]
SIG_CHUNKS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

CLONE_STRIDE = 50
CLONE_ID_OFFSET = 100000000001
THRESHOLD = 0.95
THRESHOLD_Q = 9500

SPILL_DIR = f"/tmp/duckdb-keepers-spill-{os.getpid()}"
import atexit
import shutil
atexit.register(shutil.rmtree, SPILL_DIR, ignore_errors=True)
import signal
# atexit does not run on signals; route SIGTERM/SIGINT/SIGHUP through
# sys.exit so the spill-dir cleanup above fires (r17: a SIGTERM'd gate
# left a 60 GB spill dir).
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    signal.signal(_sig, lambda s, f: sys.exit(128 + s))

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '60GB')}'")
os.makedirs(SPILL_DIR, exist_ok=True)
con.sql(f"SET temp_directory='{SPILL_DIR}'")
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
# Plan sizing IN SQL — identical algebra to the ledger oracle and
# check_embed_scale.py (q_lsh_plan pins it cross-engine).
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

con.sql(f"""CREATE TEMP TABLE planesig AS
    SELECT tb.band, ti.bit,
      md5('hp:42:' || tb.band || ':' || ti.bit || ':0') AS dg
    FROM generate_series(0, {bands - 1}) tb(band),
         generate_series(0, {bits - 1}) ti(bit)""")
# Signature pass chunked on vec_id: each chunk's proj stream is
# n/SIG_CHUNKS x bands x bits rows — bounded however big the corpus.
con.sql("""CREATE TEMP TABLE bands
    (vec_id BIGINT, band BIGINT, h BIGINT)""")
for i in range(SIG_CHUNKS):
    con.sql(f"""INSERT INTO bands
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
          FROM aug e CROSS JOIN planesig p
          WHERE e.vec_id % {SIG_CHUNKS} = {i}) t
        GROUP BY 1, 2""")
    print(f"signatures chunk {i + 1}/{SIG_CHUNKS}: "
          f"{time.time() - t0:.1f}s", flush=True)

# Star candidates: one edge from each bucket member to the bucket min —
# O(c) per bucket by construction (the whole point), so no chunking.
con.sql("""CREATE TEMP TABLE cand AS
    SELECT DISTINCT m AS a, vec_id AS b FROM (
      SELECT vec_id, min(vec_id) OVER (PARTITION BY band, h) AS m
      FROM bands) st
    WHERE vec_id <> m""")
ncand = con.sql("SELECT count(*) FROM cand").fetchone()[0]
print(f"star candidates: {ncand} ({time.time() - t0:.1f}s)", flush=True)

con.sql(f"""CREATE TEMP TABLE vecs AS
    SELECT vec_id, embedding, sqrt({dot('embedding', 'embedding')}) AS nrm
    FROM aug WHERE vec_id IN (
      SELECT a FROM cand UNION SELECT b FROM cand)""")
con.sql(f"""CREATE TEMP TABLE pairs AS
    SELECT a, b FROM (
      SELECT c.a, c.b,
        CAST(floor(({dot('ex.embedding', 'ey.embedding')} /
          (ex.nrm * ey.nrm)) * 10000 + 0.5) AS BIGINT) AS score_q
      FROM cand c
      JOIN vecs ex ON ex.vec_id = c.a
      JOIN vecs ey ON ey.vec_id = c.b) t
    WHERE score_q >= {THRESHOLD_Q}""")
npairs = con.sql("SELECT count(*) FROM pairs").fetchone()[0]
print(f"verified star edges: {npairs} ({time.time() - t0:.1f}s)",
      flush=True)

# Components in Python: union-find with path compression; the
# representative is canonicalized to the component MIN id afterwards.
parent = {}


def find(x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != x:
        parent[x], x = root, parent[x]
    return root


edges = con.sql("SELECT a, b FROM pairs").fetchall()
for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        # union by min keeps the representative the smallest id seen so
        # far on the path; exact canonical min is fixed below
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo
nodes = set()
for a, b in edges:
    nodes.add(a)
    nodes.add(b)
comp_min = {}
for v in nodes:
    r = find(v)
    if r not in comp_min or v < comp_min[r]:
        comp_min[r] = v
want = [(v, comp_min[find(v)]) for v in nodes]
print(f"components: {len(nodes)} nodes, "
      f"{len(set(k for _, k in want))} components "
      f"({time.time() - t0:.1f}s)", flush=True)

import pandas as pd
want_df = pd.DataFrame(want, columns=["vec_id", "keeper_id"]).astype("int64")
con.register("want_pd", want_df)
con.sql("CREATE TEMP TABLE want AS SELECT * FROM want_pd")
con.sql(f"CREATE TEMP VIEW got AS SELECT * FROM "
        f"read_parquet('{outdir}/q_embed_keepers_auto/*.parquet')")
nw = con.sql("SELECT count(*) FROM want").fetchone()[0]
ng = con.sql("SELECT count(*) FROM got").fetchone()[0]
d1 = con.sql("SELECT count(*) FROM (SELECT * FROM got "
             "EXCEPT ALL SELECT * FROM want)").fetchone()[0]
d2 = con.sql("SELECT count(*) FROM (SELECT * FROM want "
             "EXCEPT ALL SELECT * FROM got)").fetchone()[0]
print(f"TOTAL want {nw}, got {ng}, got-want {d1}, want-got {d2} "
      f"({time.time() - t0:.1f}s)")
ok = d1 == 0 and d2 == 0 and nw == ng
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
