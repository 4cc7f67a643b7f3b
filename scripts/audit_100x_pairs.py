"""Scale audit: run pair-generating queries against an Nx replica, one
SparkSession per subprocess so a worker crash fails ONE query, not the
batch (the round-4 audit found exactly such a crash — emb_near_dup's
fixed n_blocks=8 built a ~5 GB per-task numpy matrix at 200k vectors).

Usage:
    python scripts/audit_100x_pairs.py [replica_dir] [query ...]

Default replica dir: /tmp/replica_100x (built by make_tpch_replica.py).
Default query list: every pair/candidate-generating query not already
covered by the BASELINE.md 100x table.

Prints one `RES <dir> <query> rows=<n> <sec>s` line per query (or
`FAIL <query> rc=<rc>`), then a summary.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

DEFAULT_QUERIES = [
    "neardup_prefix_jaccard",
    "doc_containment",
    "doc_decontaminate",
    "doc_incremental_dedup",
    "knn_label_accuracy",
    "basket_rules",
    "supplier_triangles",
    "supplier_co_purchase",
    "emb_near_dup_lsh",
    "source_overlap",
    "doc_gopher_filter",
]

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from etl_spark_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(app_name="audit-100x")
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
df = entry.queries()[{name!r}](spark, {sf!r})
n = df.count()
print("RES {{d}} {{q}} rows={{n}} {{t:.1f}}s".format(
    d={sf!r}, q={name!r}, n=n, t=time.time() - t0), flush=True)
"""


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args else "/tmp/replica_100x"
    names = args[1:] or DEFAULT_QUERIES
    repo = str(Path(__file__).resolve().parent.parent)
    failed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=repo, name=name, sf=sf)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # a hung query (the exact pathology this audit hunts) must
            # fail ONE row, not abort the batch with a traceback
            failed.append(name)
            print(f"FAIL {name} timeout after 1800s", flush=True)
            continue
        res = [
            line for line in proc.stdout.splitlines() if line.startswith("RES ")
        ]
        if proc.returncode == 0 and res:
            print(res[-1], flush=True)
        else:
            failed.append(name)
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
            print(
                f"FAIL {name} rc={proc.returncode} ({time.time()-t0:.0f}s)\n  "
                + "\n  ".join(tail),
                flush=True,
            )
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
