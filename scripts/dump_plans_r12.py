"""Dump explain("formatted") for every registered query at
$SPARK_GRAFT_SF_DIR (default sf0.1) into a directory, one file per query.

Usage: python scripts/dump_plans_r12.py OUTDIR [query ...]

Round-12 optimization-round instrumentation: the _before/_after plan
files the judge reads live in plans/r12/; this script generates them
(run once before and once after a change, diff the two)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.plans import explain_str  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    only = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = only or sorted(qs)
    for name in names:
        try:
            plan = explain_str(qs[name](spark, sf_dir), mode="formatted")
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR: {ex}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
