"""Regenerate tests/plan_snapshots.json — the pinned scale-critical
plan shape of every registered query at the test fixture scale.

Usage: python scripts/snapshot_plans.py
Run after any deliberate plan change; the diff of the JSON is the
review artifact (a lost broadcast or a new shuffle shows up as a
counter bump)."""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.plans import explain_str  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402

TRACKED = (
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def tracked_counts(plan: str) -> dict[str, int]:
    ops = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
    return {t: ops.count(t) for t in TRACKED if ops.count(t)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    # generate under the SAME pinned environment the test fixture uses
    # (tests/conftest.py _PLAN_SHAPING_ENV): kill-switch env vars change
    # plan shapes (fan_out repartitions, the curation pin) and would
    # bake a host's shell state into the committed snapshot (ADVICE r12)
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from conftest import _PLAN_SHAPING_ENV  # noqa: E402

    for k in _PLAN_SHAPING_ENV:
        os.environ.pop(k, None)
    spark = get_spark(app_name="snapshot-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    snap = {
        name: tracked_counts(explain_str(fn(spark, sf_dir)))
        for name, fn in sorted(entrymod.queries().items())
    }
    out = Path(__file__).parent.parent / "tests" / "plan_snapshots.json"
    out.write_text(json.dumps(snap, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(snap)} queries)")


if __name__ == "__main__":
    main()
