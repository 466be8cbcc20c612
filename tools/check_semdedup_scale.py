#!/usr/bin/env python3
"""Scale-grade oracle compare for q_semdedup (driver-side only).

Two things break the ledger compare at mult=1000 (~31k vectors/cell):
the DuckDB oracle evaluates ~3e10 intra-cell pair cosines through
per-element list lambdas (OOM-killed at every cap), and the engine's
DEFAULT hot-cell dial (maxCellSize=16384) takes the documented
semantics-NARROWING sub-split path, which the all-pairs oracle cannot
follow by contract. The certification run therefore uses the exact-path
dial (`SPARK_GRAFT_SEMDEDUP_MAXCELL` above the max cell population —
path 0, the published SemDeDup semantics, byte-identical to the
unbounded form) and this checker, which re-derives the oracle's exact
quantized arithmetic with a linear+BLAS toolchain:

 - centroid affinities and intra-cell pairwise cosines run as chunked
   float64 matrix products (numpy/BLAS) instead of per-element SQL
   lambdas;
 - every quantized comparison the semantics depend on — the r4
   affinity used for cell argmax and the drop key, and the >= 3500
   pair cut — is guarded by a BOUNDARY BAND: any value within 1e-6 of
   a floor(x*10000+0.5) boundary (or of the 3500 cut) is recomputed
   with the oracle's exact sequential summation order, so BLAS
   reassociation (error ~1e-9 on this scale) can never flip a
   comparison silently;
 - drop rule replicated exactly: sort cell members by (quantized aff,
   vec_id); a member is dropped iff some member with a strictly lower
   key has quantized cosine >= threshold — the oracle's
   CASE WHEN x.aff > y.aff THEN x ELSE y over all intra-cell pairs;
 - (vec_id, cell_id, dropped) is compared against the Spark dump with
   DuckDB EXCEPT ALL in both directions — exact, dtype-strict.

Mirrors queries/SimilarityQueries.scala q_semdedup (keep centroid
derivation, r4 quantization, threshold and drop key in sync).

usage: check_semdedup_scale.py <sfDir> <outDir> [thresholdQ]
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import math
import os
import shutil
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

if len(sys.argv) < 3:
    sys.exit(__doc__)
sfdir, outdir = sys.argv[1], sys.argv[2]
THRESH_Q = int(sys.argv[3]) if len(sys.argv) > 3 else 3500
N_CENTS = 64
CENT_STRIDE = 37
BAND = 1e-6  # boundary band width on the x*10000+0.5 scale

SPILL_DIR = f"/tmp/duckdb-semdedup-spill-{os.getpid()}"
import atexit
atexit.register(shutil.rmtree, SPILL_DIR, ignore_errors=True)
import signal
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    signal.signal(_sig, lambda s, f: sys.exit(128 + s))
os.makedirs(SPILL_DIR, exist_ok=True)

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '20GB')}'")
con.sql(f"SET temp_directory='{SPILL_DIR}'")
con.sql("SET threads=16")

emb = f"{sfdir}/embeddings.parquet"
pat = f"{emb}/*.parquet" if os.path.isdir(emb) else emb

t0 = time.time()
tbl = con.sql(f"SELECT vec_id, embedding FROM '{pat}' ORDER BY vec_id") \
    .fetch_arrow_table()
ids = tbl.column("vec_id").to_numpy()
emb_col = tbl.column("embedding").combine_chunks()
# fixed-length lists: flat values + reshape beats to_pylist by ~100x
flat = emb_col.values.to_numpy(zero_copy_only=False)
n = len(ids)
dim = len(flat) // n
assert dim * n == len(flat), "ragged embedding lists"
X32 = flat.astype(np.float32).reshape(n, dim)
X = X32.astype(np.float64)
print(f"[semdedup] loaded {n} x {dim} in {time.time() - t0:.1f}s",
      flush=True)

cmask = (ids % CENT_STRIDE == 0) & (ids < CENT_STRIDE * N_CENTS)
cid = (ids[cmask] // CENT_STRIDE).astype(np.int64)
C = X[cmask]
order = np.argsort(cid)
cid, C = cid[order], C[order]
assert (cid == np.arange(len(cid))).all(), "centroid ids not dense"

norm_x = np.sqrt(np.einsum("ij,ij->i", X, X))
norm_c = np.sqrt(np.einsum("ij,ij->i", C, C))


def seq_q(xi, yi):
    """The oracle's exact arithmetic: sequential double sums, then
    floor(dot/(sqrt(nx)*sqrt(ny)) * 10000 + 0.5)."""
    dot = nx = ny = 0.0
    for a, b in zip(X32[xi].tolist(), X32[yi].tolist()):
        dot += a * b
        nx += a * a
        ny += b * b
    return math.floor(dot / (math.sqrt(nx) * math.sqrt(ny)) * 10000 + 0.5)


def seq_q_cent(xi, cj):
    dot = nx = ny = 0.0
    xr, cr = X32[xi].tolist(), C[cj].tolist()
    for a, b in zip(xr, cr):
        dot += a * b
        nx += a * a
        ny += b * b
    return math.floor(dot / (math.sqrt(nx) * math.sqrt(ny)) * 10000 + 0.5)


# --- assignment: argmax over (quantized aff, -cell_id) ---
assign_cell = np.empty(n, dtype=np.int64)
assign_affq = np.empty(n, dtype=np.int64)
n_reverify = 0
CH = 1 << 18
for lo in range(0, n, CH):
    hi = min(lo + CH, n)
    V = (X[lo:hi] @ C.T) / np.outer(norm_x[lo:hi], norm_c) * 10000 + 0.5
    near = np.abs(V - np.rint(V)) < BAND
    Q = np.floor(V).astype(np.int64)
    for i, j in zip(*np.nonzero(near)):
        Q[i, j] = seq_q_cent(lo + i, j)
        n_reverify += 1
    best = np.argmax(Q, axis=1)  # first max = lowest cell_id tie-break
    assign_cell[lo:hi] = best
    assign_affq[lo:hi] = Q[np.arange(hi - lo), best]
print(f"[semdedup] assigned ({n_reverify} boundary re-verifies) "
      f"in {time.time() - t0:.1f}s", flush=True)

# --- intra-cell drop pass ---
dropped = np.zeros(n, dtype=np.int64)
pair_reverify = 0
for cell in range(N_CENTS):
    members = np.nonzero(assign_cell == cell)[0]
    if len(members) < 2:
        continue
    # sort by the drop key (quantized aff, vec_id): a member is dropped
    # iff an above-threshold neighbor has a strictly lower key.
    # floor(cos*10000+0.5) >= THRESH_Q  <=>  cos >= (THRESH_Q-0.5)/10000,
    # so the scan works on raw cosines with ONE comparison; the band
    # falls back to the oracle's sequential arithmetic near the cut.
    key = np.lexsort((ids[members], assign_affq[members]))
    m = members[key]
    M = len(m)
    Xn = X[m] / norm_x[m][:, None]  # normalized rows: matmul = cosine
    CUT = (THRESH_Q - 0.5) / 10000.0
    dm = np.zeros(M, dtype=bool)
    # Early-terminating block scan: columns advance in ascending key
    # order, and a member leaves the undecided set the moment any
    # lower-key above-threshold neighbor is seen. On dense cells
    # (this fixture drops >99% of members, mostly to the very lowest
    # keys) the undecided set collapses after the first blocks.
    und = np.arange(1, M)
    B = 2048
    for b0 in range(0, M, B):
        if und.size == 0:
            break
        b1 = min(b0 + B, M)
        rows = und[und > b0]
        if rows.size == 0:
            continue
        S = Xn[rows] @ Xn[b0:b1].T
        near = np.abs(S - CUT) < 1e-9
        for i, j in zip(*np.nonzero(near)):
            S[i, j] = CUT if seq_q(m[rows[i]], m[b0 + j]) >= THRESH_Q \
                else CUT - 1.0  # exact verdict for boundary pairs
            pair_reverify += 1
        ok_col = np.arange(b0, b1)[None, :] < rows[:, None]
        hit = ((S >= CUT) & ok_col).any(axis=1)
        dm[rows[hit]] = True
        und = und[~dm[und]]
    dropped[m[dm]] = 1
    print(f"[semdedup] cell {cell}: {len(m)} members, "
          f"{int(dm.sum())} dropped ({time.time() - t0:.1f}s)", flush=True)
print(f"[semdedup] pair boundary re-verifies: {pair_reverify}", flush=True)

oracle_pq = f"{SPILL_DIR}/semdedup_oracle.parquet"
pq.write_table(pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "cell_id": pa.array(assign_cell, pa.int64()),
    "dropped": pa.array(dropped, pa.int64()),
}), oracle_pq)

spark_pat = f"{outdir}/q_semdedup/*.parquet"
n_spark = con.sql(f"SELECT count(*) FROM '{spark_pat}'").fetchone()[0]
d1 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{spark_pat}' "
             f"EXCEPT ALL SELECT * FROM '{oracle_pq}')").fetchone()[0]
d2 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{oracle_pq}' "
             f"EXCEPT ALL SELECT * FROM '{spark_pat}')").fetchone()[0]
ok = n_spark == n and d1 == 0 and d2 == 0
print(f"[semdedup] spark={n_spark} oracle={n} "
      f"spark-minus-oracle={d1} oracle-minus-spark={d2} "
      f"({time.time() - t0:.1f}s)")
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
