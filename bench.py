"""Benchmark harness: runs every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
write cost, nothing collected to the driver). One warmup of the smallest
query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-spark-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # warmup: JVM + codegen + parquet footer caches
    _force(queries["normalize_keys"](spark, sf_dir))

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # second run: plan/codegen compiled — the steady-state number a
        # long-lived cluster sees
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        warm[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "total_warm_sec": round(sum(warm.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
