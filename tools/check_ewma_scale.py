#!/usr/bin/env python3
"""Scale-grade oracle compare for q_ewma (driver-side only).

The ledger oracle folds a per-user `list(value ORDER BY ts, event_id)`
with lambda `list_reduce`s, and the alert count re-reduces every prefix
— O(n^2) lambda evaluations per user. At mult=1000 (100M events,
1.5M users) DuckDB's lambda executor dies on it (40GB: OOM after 7
min; 100GB: segfault) — the failure is the *checker's* form, not the
operator's. This checker re-derives the SAME semantics with a linear
toolchain:

 - DuckDB external-sorts `(user_id, value)` by (user_id, ts, event_id)
   — the oracle's exact ordering, made total by the fixture's unique
   event_id — and STREAMS record batches, so no per-user list and no
   lambda ever materializes;
 - Python folds the recurrence incrementally per user:
   ewma starts at the first value; for each later x, alert iff
   x > 1.5*ewma, then ewma = 0.5*ewma + 0.5*x. This is exactly
   `list_reduce(vs[1:i-1], ...)` unrolled — same IEEE doubles, same
   operation order, so `final_ewma` matches the ledger oracle (and the
   Spark fold that hash-matched it at sf0.01) bit-for-bit before the
   shared floor(x*10000+0.5)/10000 rounding;
 - the (user_id, n_events, final_ewma, n_alerts) table is compared
   against the Spark dump with DuckDB EXCEPT ALL in both directions —
   exact, dtype-strict, identical to check_correctness.py's contract.

Mirrors queries/AnalyticsQueries.scala q_ewma (keep the recurrence,
ordering, and rounding in sync with the ledger oracle_sql entry).

usage: check_ewma_scale.py <sfDir> <outDir>
exit 0 + "MATCH" iff zero diffs both directions and row counts agree.
"""
import math
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

SPILL_DIR = f"/tmp/duckdb-ewma-spill-{os.getpid()}"
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

events = f"{sfdir}/events.parquet"
pat = f"{events}/*.parquet" if os.path.isdir(events) else events

t0 = time.time()
reader = con.sql(
    f"SELECT user_id, value FROM '{pat}' "
    "ORDER BY user_id, ts, event_id").fetch_arrow_reader(1 << 20)

# One sequential pass; users are contiguous after the sort.
out_uid, out_n, out_ewma, out_alerts = [], [], [], []
cur = None
ewma = 0.0
n = 0
alerts = 0
rows = 0


def flush():
    out_uid.append(cur)
    out_n.append(n)
    out_ewma.append(math.floor(ewma * 10000 + 0.5) / 10000)
    out_alerts.append(alerts)


for batch in reader:
    uids = batch.column(0).to_numpy(zero_copy_only=False)
    vals = batch.column(1).to_numpy(zero_copy_only=False)
    rows += len(uids)
    for u, x in zip(uids.tolist(), vals.tolist()):
        if u != cur:
            if cur is not None:
                flush()
            cur, ewma, n, alerts = u, x, 1, 0
        else:
            if x > 1.5 * ewma:
                alerts += 1
            ewma = 0.5 * ewma + 0.5 * x
            n += 1
if cur is not None:
    flush()
print(f"[ewma] folded {rows} events -> {len(out_uid)} users "
      f"in {time.time() - t0:.1f}s", flush=True)

oracle_pq = f"{SPILL_DIR}/ewma_oracle.parquet"
pq.write_table(pa.table({
    "user_id": pa.array(out_uid, pa.int64()),
    "n_events": pa.array(out_n, pa.int64()),
    "final_ewma": pa.array(out_ewma, pa.float64()),
    "n_alerts": pa.array(out_alerts, pa.int64()),
}), oracle_pq)

spark_pat = f"{outdir}/q_ewma/*.parquet"
n_spark = con.sql(f"SELECT count(*) FROM '{spark_pat}'").fetchone()[0]
n_oracle = len(out_uid)
d1 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{spark_pat}' "
             f"EXCEPT ALL SELECT * FROM '{oracle_pq}')").fetchone()[0]
d2 = con.sql(f"SELECT count(*) FROM (SELECT * FROM '{oracle_pq}' "
             f"EXCEPT ALL SELECT * FROM '{spark_pat}')").fetchone()[0]
ok = n_spark == n_oracle and d1 == 0 and d2 == 0
print(f"[ewma] spark={n_spark} oracle={n_oracle} "
      f"spark-minus-oracle={d1} oracle-minus-spark={d2} "
      f"({time.time() - t0:.1f}s)")
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
