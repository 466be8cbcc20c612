#!/usr/bin/env python3
"""Subset-oracle compare for q_minhash_lsh_auto at fixtures where the
full DuckDB re-derivation no longer fits the round (the signature stage
is linear in total token volume: ~35 min of oracle CPU at mult=300,
projected ~2-3.5 h at mult=1000 — the cutover point recorded in
SCALE.md).

The subset oracle is the LEDGER ORACLE with ONE surgical change: the
`docs` CTE is restricted to doc_id % STRIDE = 0. Everything else —
including the auto-plan sizing, whose `nn` CTE counts the FULL
documents table — is byte-identical, so the plan under test is the
production plan, and the oracle mines the exact pair sub-block whose
BOTH endpoints fall in the subset. The Spark dump is filtered to the
same sub-block and compared EXCEPT ALL in both directions.

Soundness of the surgery is not assumed: --validate runs BOTH the full
ledger oracle and the subset oracle on a small fixture and asserts the
subset result equals the full result filtered to the sub-block. Run
that on sf0.01 before trusting a big-mult verdict.

usage: check_minhash_subset.py <sfDir> <outDir> [stride] [--validate]
exit 0 + "MATCH" iff zero diffs both directions on the sub-block.
"""
import json
import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--validate"]
validate = "--validate" in sys.argv
if len(args) < 2:
    sys.exit(__doc__)
sfdir, outdir = args[0], args[1]
STRIDE = int(args[2]) if len(args) > 2 else 4

full_sql = json.load(open(f"{outdir}/oracle_sql.json"))["q_minhash_lsh_auto"]
NEEDLE = "AS toks FROM documents))"
assert full_sql.count(NEEDLE) == 1, "oracle SQL drifted; update the surgery"
subset_sql = full_sql.replace(
    NEEDLE, f"AS toks FROM documents WHERE doc_id % {STRIDE} = 0))")

con = duckdb.connect()
con.sql(f"SET threads={os.environ.get('GRAFT_DUCKDB_THREADS', '16')}")
mem = os.environ.get("GRAFT_DUCKDB_MEM")
if mem:
    con.sql(f"SET memory_limit='{mem}'")
spill = f"/tmp/duckdb-minhash-spill-{os.getpid()}"
os.makedirs(spill, exist_ok=True)
con.sql(f"SET temp_directory='{spill}'")
con.sql("SET preserve_insertion_order=false")
p = f"{sfdir}/documents.parquet"
pat = f"{p}/*.parquet" if os.path.isdir(p) else p
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")

if validate:
    con.sql(f"CREATE TABLE want_full AS {full_sql}")
    con.sql(f"CREATE TABLE want_sub AS {subset_sql}")
    d1 = con.sql(f"""SELECT count(*) FROM (
        SELECT * FROM want_full
        WHERE a % {STRIDE} = 0 AND b % {STRIDE} = 0
        EXCEPT ALL SELECT * FROM want_sub)""").fetchone()[0]
    d2 = con.sql(f"""SELECT count(*) FROM (
        SELECT * FROM want_sub EXCEPT ALL
        SELECT * FROM want_full
        WHERE a % {STRIDE} = 0 AND b % {STRIDE} = 0)""").fetchone()[0]
    n = con.sql("SELECT count(*) FROM want_sub").fetchone()[0]
    print(f"[minhash-subset] VALIDATE stride={STRIDE}: sub-block rows {n}, "
          f"full-filtered-minus-sub {d1}, sub-minus-full-filtered {d2}")
    sys.exit(0 if d1 == 0 and d2 == 0 else 1)

con.sql(f"CREATE TABLE want AS {subset_sql}")
con.sql(f"""CREATE VIEW got AS
    SELECT * FROM read_parquet('{outdir}/q_minhash_lsh_auto/*.parquet')
    WHERE a % {STRIDE} = 0 AND b % {STRIDE} = 0""")
nw = con.sql("SELECT count(*) FROM want").fetchone()[0]
ng = con.sql("SELECT count(*) FROM got").fetchone()[0]
d1 = con.sql("SELECT count(*) FROM (SELECT * FROM want "
             "EXCEPT ALL SELECT * FROM got)").fetchone()[0]
d2 = con.sql("SELECT count(*) FROM (SELECT * FROM got "
             "EXCEPT ALL SELECT * FROM want)").fetchone()[0]
print(f"[minhash-subset] stride={STRIDE}: want {nw}, got {ng}, "
      f"want-got {d1}, got-want {d2}")
print("MATCH" if (nw == ng and d1 == 0 and d2 == 0) else "MISMATCH")
sys.exit(0 if (nw == ng and d1 == 0 and d2 == 0) else 1)
