#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
results Verify dumped, runs each oracle SQL in DuckDB over the same
scale-factor tables, and compares (schema by sorted column names, values
as sorted row multisets). Usage: check_correctness.py <sfDir> <outDir>.

Resilience (learned at mult=100, twice): one heavyweight oracle hitting
DuckDB's buffer-manager limit used to POISON the shared connection —
every later query failed with the same OutOfMemoryException and dozens
of false FAILs had to be re-adjudicated by hand. Now every query runs
with one retry on a FRESH connection, and connections are opened with
an explicit thread cap + spill dir (threads=16 is what fits the
q_simhash oracle's materialized CTEs in the buffer budget on a
128 GiB host; DuckDB's default thread count scales the per-operator
memory footprint with it).
"""
import json
import os
import sys

import duckdb

USAGE = ("usage: check_correctness.py <sfDir> <outDir> [--json <path>] "
         "[--skip q_a,q_b]")
json_out = None
skip = set()
argv = list(sys.argv[1:])
if "--json" in argv:
    i = argv.index("--json")
    if i + 1 >= len(argv):
        sys.exit(f"--json needs a path\n{USAGE}")
    json_out = argv[i + 1]
    del argv[i:i + 2]
only = set()
if "--only" in argv:
    # One-query-per-process isolation: a DuckDB segfault (observed on a
    # mult=300 media oracle) kills the whole gate, so the harness can
    # drive each remaining query in its own process and merge reports.
    i = argv.index("--only")
    if i + 1 >= len(argv):
        sys.exit(f"--only needs a comma list\n{USAGE}")
    only = {q.strip() for q in argv[i + 1].split(",") if q.strip()}
    del argv[i:i + 2]
resume_path = None
if "--resume" in argv:
    i = argv.index("--resume")
    if i + 1 >= len(argv):
        sys.exit(f"--resume needs a path\n{USAGE}")
    resume_path = argv[i + 1]
    del argv[i:i + 2]
native = set()
if "--native" in argv:
    # DuckDB-native compare (EXCEPT ALL both directions over materialized
    # temp tables) for queries whose result is too big for the pandas
    # frame compare: at mult=1000 q_tokenize is ~271M rows — two pandas
    # frames plus their sorts would not fit even a 128 GiB host, while
    # DuckDB's hash-based set ops stream and spill. Dtype strictness is
    # preserved by comparing the LIMIT-0 pandas dtypes of both sides
    # (the same conversion the frame compare would have hashed).
    i = argv.index("--native")
    if i + 1 >= len(argv):
        sys.exit(f"--native needs a comma list\n{USAGE}")
    native = {q.strip() for q in argv[i + 1].split(",") if q.strip()}
    del argv[i:i + 2]
if "--skip" in argv:
    # For queries delegated to the chunked scale checkers
    # (check_embed_scale.py / check_simhash_scale.py) at big mult
    # fixtures: their single-shot oracles OOM the DuckDB process there
    # (std::bad_alloc outside the buffer-manager budget — not a
    # catchable connection error), so they must not run here at all.
    # Skipped queries are simply absent from the report; the harness
    # patches in the scale checkers' verdicts afterwards.
    i = argv.index("--skip")
    if i + 1 >= len(argv):
        sys.exit(f"--skip needs a comma list\n{USAGE}")
    skip = {q.strip() for q in argv[i + 1].split(",") if q.strip()}
    del argv[i:i + 2]
if len(argv) != 2:
    sys.exit(USAGE)
sfdir, outdir = argv[0], argv[1]

# Per-process spill dir: a fixed path let concurrent gate processes
# (parallel --only batches at big mults) race on each other's temp
# files — DuckDB terminates the whole process when a spill file it
# owns disappears under it. Removed at exit: heavy oracles can leave
# multi-GB spill files behind, and at big mults those compete with
# Spark shuffles for the one disk across gate runs.
SPILL_DIR = f"/tmp/duckdb-gate-spill-{os.getpid()}"
import atexit
import shutil
import signal
atexit.register(shutil.rmtree, SPILL_DIR, ignore_errors=True)
# atexit does NOT run on signals: a SIGTERM'd gate left a 60 GB spill
# dir behind (r17). Route the termination signals through sys.exit so
# the atexit hook fires; SIGKILL still leaks, which only a next-run
# sweep could catch.
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    signal.signal(_sig, lambda s, f: sys.exit(128 + s))


def fresh_connection():
    """New connection with the fixture views + bounded resources."""
    c = duckdb.connect()
    c.sql("SET threads=16")
    # GRAFT_DUCKDB_MEM caps the buffer budget when the gate shares the
    # host with a running Spark dump (incremental checking at big mults)
    # — without it DuckDB assumes 80% of RAM and the OS OOM killer can
    # take out the Spark process mid-dump.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        c.sql(f"SET memory_limit='{mem}'")
    os.makedirs(SPILL_DIR, exist_ok=True)
    c.sql(f"SET temp_directory='{SPILL_DIR}'")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        # driver fixtures are single parquet files; ScaleFixture (mult=N)
        # tables are Spark directory-parquet — glob those
        p = f"{sfdir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    return c


con = fresh_connection()
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = bad = 0
report = {}

# --resume <prior.json>: skip queries a previous (crashed) run already
# verified green, re-running only the rest. Written because a gate run
# at mult=300 died 46 queries in (a cornered 114 MiB numpy allocation
# escaped through the except-handler's fresh_connection()) and the
# report — only written at exit back then — lost every finished result.
resume = {}
if resume_path:
    resume = {k: v for k, v in
              json.load(open(resume_path))["queries"].items()
              if v.get("match")}


def flush_report():
    """Incremental checkpoint after EVERY query: a crash mid-run keeps
    all finished verdicts resumable."""
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sfdir, "ok": ok, "failed": bad,
                       "queries": report}, f, indent=1, sort_keys=True)


def record(name, rows, match, detail=""):
    report[name] = {"rows": rows, "match": match, "detail": detail}
    flush_report()


def rebuild_connection(c):
    """Teardown + rebuild that cannot raise out of an except handler:
    under real memory pressure the rebuild itself can OOM — back off
    and retry a few times, then re-raise (nothing else to do)."""
    try:
        c.close()
    except Exception:
        pass
    import gc
    import time
    for backoff in (0, 5, 30):
        time.sleep(backoff)
        gc.collect()
        try:
            return fresh_connection()
        except Exception:
            continue
    return fresh_connection()


def native_compare(name, sql):
    """Exact compare without pandas frames: counts, LIMIT-0 dtypes, then
    EXCEPT ALL in both directions (NULL-safe by SQL set-op semantics).
    Returns (rows, match, detail)."""
    c = fresh_connection()
    try:
        c.sql(f"""CREATE TEMP TABLE got AS SELECT * FROM
            read_parquet('{outdir}/{name}/*.parquet')""")
        c.sql(f"CREATE TEMP TABLE want AS {sql}")
        gd = c.sql("SELECT * FROM got LIMIT 0").df()
        wd = c.sql("SELECT * FROM want LIMIT 0").df()
        gcols, wcols = sorted(gd.columns), sorted(wd.columns)
        if gcols != wcols:
            return -1, False, f"columns {gcols} != {wcols}"
        gt = [str(gd[cn].dtype) for cn in gcols]
        wt = [str(wd[cn].dtype) for cn in wcols]
        if gt != wt:
            return -1, False, f"dtypes {gt} != {wt}"
        ng = c.sql("SELECT count(*) FROM got").fetchone()[0]
        nw = c.sql("SELECT count(*) FROM want").fetchone()[0]
        if ng != nw:
            return ng, False, f"rows {ng} != {nw}"
        cols = ", ".join(f'"{cn}"' for cn in gcols)
        d1 = c.sql(f"""SELECT count(*) FROM (SELECT {cols} FROM got
            EXCEPT ALL SELECT {cols} FROM want)""").fetchone()[0]
        d2 = c.sql(f"""SELECT count(*) FROM (SELECT {cols} FROM want
            EXCEPT ALL SELECT {cols} FROM got)""").fetchone()[0]
        if d1 or d2:
            return ng, False, f"value mismatch: got-want {d1}, want-got {d2}"
        return ng, True, "native"
    finally:
        try:
            c.close()
        except Exception:
            pass


for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    if name in skip:
        print(f"skip {name} (delegated to a chunked scale checker)")
        continue
    if name in resume:
        r = resume[name]
        print(f"ok   {name} ({r['rows']} rows) [resumed]")
        record(name, r["rows"], True, r.get("detail", ""))
        ok += 1
        continue
    if name in native:
        try:
            rows, match, detail = native_compare(name, sql)
        except Exception as e:
            rows, match, detail = -1, False, f"{type(e).__name__}: {e}"[:300]
        print(f"{'ok  ' if match else 'FAIL'} {name} ({rows} rows) "
              f"[native]{'' if match else ': ' + detail}")
        record(name, rows, match, detail)
        if match:
            ok += 1
        else:
            bad += 1
        continue
    got = want = None
    err = None
    for attempt in (1, 2):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            err = None
            break
        except Exception as e:
            err = e
            # the failed attempt may have poisoned the connection
            # (DuckDB OOM leaves it unusable) — rebuild before the
            # retry AND for whatever query comes next
            con = rebuild_connection(con)
    if err is not None:
        print(f"FAIL {name}: {type(err).__name__}: {err}")
        record(name, -1, False, f"{type(err).__name__}: {err}"[:300])
        bad += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        record(name, len(got), False,
               f"columns {list(got.columns)} != {list(want.columns)}")
        bad += 1
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        record(name, len(g), False, f"rows {len(g)} != {len(w)}")
        bad += 1
        continue
    try:
        import pandas as pd
        # dtype-strict to mirror the driver's hash, which distinguishes
        # e.g. DuckDB HUGEINT sums from Spark BIGINT even at equal values.
        pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                      check_exact=True)
        print(f"ok   {name} ({len(g)} rows)")
        record(name, len(g), True)
        ok += 1
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
        diff = g.compare(w) if g.shape == w.shape else None
        if diff is not None and not diff.empty:
            print(diff.head(5).to_string())
        record(name, len(g), False, f"value mismatch: {str(e)[:300]}")
        bad += 1

print(f"\n{ok} ok, {bad} failed, "
      f"{len(oracle)} oracled of total declared")
flush_report()
sys.exit(1 if bad else 0)
