#!/usr/bin/env python3
"""Pin the gate's spill-sweep liveness contract (VERDICT r17 item 8).

The sweep must delete spill dirs owned by DEAD checker PIDs and must
NEVER touch a dir owned by a LIVE one (the r17 race: a bare rm -rf wiped
a concurrent checker's live spill dir → DuckDB rc=134/139 mid-compare,
six queries lost). Also: non-numeric suffixes are left alone.

Run directly (python3 tools/test_sweep_spills.py) or via pytest.
"""
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SWEEP = os.path.join(HERE, "sweep_spills.sh")


def _mkdirs():
    live_pid = os.getpid()  # this test process: definitely alive
    # a child that has already exited and been reaped: definitely dead
    child = subprocess.Popen(["true"])
    child.wait()
    dead_pid = child.pid
    dirs = {
        "live": f"/tmp/duckdb-testspill-{live_pid}",
        "dead": f"/tmp/duckdb-testspill-{dead_pid}",
        "nonpid": "/tmp/duckdb-testspill-notapid",
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "block.tmp"), "w") as f:
            f.write("x")
    return dirs


def _cleanup(dirs):
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)


def test_sweep_keeps_live_removes_dead():
    dirs = _mkdirs()
    try:
        subprocess.run(
            ["bash", "-c", f". {SWEEP} && sweep_spills"], check=True)
        assert os.path.isdir(dirs["live"]), (
            "sweep removed a LIVE checker's spill dir — the exact r17 race")
        assert not os.path.exists(dirs["dead"]), (
            "sweep failed to remove a dead checker's spill dir")
        assert os.path.isdir(dirs["nonpid"]), (
            "sweep touched a dir whose suffix is not a PID")
    finally:
        _cleanup(dirs)


if __name__ == "__main__":
    test_sweep_keeps_live_removes_dead()
    print("sweep_spills contract: PASS")
