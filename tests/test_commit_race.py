"""TRUE multi-process commit race for the versioned store (verdict-r7
task 2): two real writer PROCESSES — separate Python interpreters,
separate Spark JVMs — race a CAS ``write_version`` on one table under
both entry layouts. The in-process simulation (test_commit_protocol.py)
pins the conflict signal; this pins that the put-if-absent primitive
itself arbitrates correctly when the contenders share nothing but the
filesystem:

- exactly one writer commits version N (the CAS winner);
- the loser gets the documented ConcurrentWriteError, not a torn table;
- the table afterwards holds exactly the pre-race versions plus ONE new
  committed snapshot, fully readable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from etl_spark_spark.sinks.versioned import (
    committed_versions,
    read_versioned,
    write_version,
)

_WRITER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
root, layout, ready, barrier, out, tag = sys.argv[1:7]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from etl_spark_spark.sinks.versioned import (
    ConcurrentWriteError, current_version, write_version,
)
df = spark.createDataFrame([(int(tag), "w" + tag)], "k int, v string")
cur = current_version(root)
open(ready, "w").write(str(cur))
deadline = time.time() + 120
while not os.path.exists(barrier):
    if time.time() > deadline:
        open(out, "w").write("BARRIER_TIMEOUT\n"); sys.exit(2)
    time.sleep(0.02)
try:
    v = write_version(spark, df, root, expected_current=cur, layout=layout)
    open(out, "w").write(f"WIN {{v}}\n")
except ConcurrentWriteError:
    open(out, "w").write("CONFLICT\n")
spark.stop()
""".format(repo="/root/repo")


def _wait_for(paths, timeout_sec, what):
    deadline = time.time() + timeout_sec
    while not all(os.path.exists(p) for p in paths):
        if time.time() > deadline:
            raise TimeoutError(f"timed out waiting for {what}")
        time.sleep(0.1)


@pytest.mark.parametrize("layout", ["symlink", "marker"])
def test_two_process_cas_race_has_one_winner(spark, tmp_path, layout):
    root = str(tmp_path / f"race_{layout}")
    v1 = write_version(
        spark,
        spark.createDataFrame([(0, "base")], "k int, v string"),
        root,
        layout=layout,
    )

    script = tmp_path / "writer.py"
    script.write_text(_WRITER)
    barrier = str(tmp_path / "go")
    procs, readies, outs = [], [], []
    for tag in ("1", "2"):
        ready = str(tmp_path / f"ready{tag}")
        out = str(tmp_path / f"out{tag}")
        readies.append(ready)
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), root, layout, ready, barrier, out, tag],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    try:
        # both JVMs up, both have read the same expected_current: GO
        _wait_for(readies, 180, "writer startup")
        assert all(Path(r).read_text() == str(v1) for r in readies)
        Path(barrier).touch()
        for p in procs:
            assert p.wait(timeout=180) == 0
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = sorted(Path(o).read_text().split()[0] for o in outs)
    assert results == ["CONFLICT", "WIN"], f"got {results}"

    committed = committed_versions(root)
    assert len(committed) == 2 and committed[0] == v1
    winner_tag = next(
        Path(o).stem[-1] for o in outs if Path(o).read_text().startswith("WIN")
    )
    rows = {
        (r["k"], r["v"]) for r in read_versioned(spark, root).collect()
    }
    assert rows == {(int(winner_tag), f"w{winner_tag}")}
    # pre-race snapshot still time-travels
    assert {
        r["v"] for r in read_versioned(spark, root, version=v1).collect()
    } == {"base"}
