"""The reference's scheduled driver, re-expressed on this engine —
the migration example for a user of Marcus-Holanda777/etl-spark.

Reference shape (etl_job.py:117-130): one cron-launched process that

1. computes the [start, end] date window with the days-1-5
   month-rollback rule (etl_job.py:120-125);
2. ALWAYS runs the superdesconto daily cycle: window-scan the POS
   feeds, take the best-discounted sale per label, join dimensions,
   MERGE into the etiqueta-keyed target (etl_job.py:28-85);
3. on days 1-5 only, backfills ressarcimento year by year from 2023
   (etl_job.py:87-114), skipping empty results (etl_job.py:102).

What changes on this engine — and why a 100 TB user cares:

- the reference collects every result to driver pandas and hands it to
  a single-node DuckDB/Athena writer (etl_job.py:68,100 — the one
  architectural scale bug called out in SURVEY §0); here every sink is
  executor-side: the superdesconto MERGE goes through the CAS-committed
  versioned store, ressarcimento snapshots are plain parquet writes;
- daily-file path enumeration (utils_superdesconto.py:62-66) becomes a
  stats-index-pruned window read over the z-ordered feed — the engine
  opens only window-overlapping files and stays correct when files
  span days;
- the non-empty guard uses isEmpty() (a limit-1 job) instead of
  collecting the whole frame to check .empty.

Run:  python examples/daily_job.py [sf_dir] [output_root] [--date YYYY-MM-DD]
Everything is driven by the same fixtures the test suite uses; the
output root receives  best_sales/  (versioned MERGE target) and
ressarcimento_<year>/  snapshots.
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys

sys.path.insert(0, ".")

from etl_spark_spark.pipelines.daily_loop import run_daily_loop, stage_feed
from etl_spark_spark.pipelines.incremental import (
    backfill_years,
    date_window,
    run_guarded,
    should_run_monthly,
)
from etl_spark_spark.pipelines.ressarcimento import allocation_pipeline
from etl_spark_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("output_root", nargs="?", default="/tmp/daily_job_demo")
    ap.add_argument(
        "--date",
        default="1995-02-03",
        help="the 'today' the scheduler launched with (fixture data is "
        "1992-1998, so the default lands in range)",
    )
    ns = ap.parse_args()
    today = dt.date.fromisoformat(ns.date)

    spark = get_spark(app_name="daily-job-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. the reference's date window (month rollback inside days 1-5)
    start, end = date_window(today)
    print(f"window: {start} .. {end}")

    # 2. superdesconto daily cycle: pruned window read -> transform ->
    #    versioned MERGE (reference etl_job.py:28-85, engine-side sinks)
    feed = f"{ns.output_root}/pos_feed"
    target = f"{ns.output_root}/best_sales"
    stage_feed(spark, ns.sf_dir, feed)  # once per layout refresh in prod
    snap, scans = run_daily_loop(
        spark, ns.sf_dir, feed, target,
        windows=[(start, end, today.isoformat())],
    )
    n = snap.count()
    print(
        f"superdesconto: merged window into {target} "
        f"(snapshot {n} rows; opened {scans[0][0]}/{scans[0][1]} files)"
    )

    # 3. ressarcimento: days 1-5 only, year-by-year backfill, empty
    #    results skipped (reference etl_job.py:87-114)
    if should_run_monthly(today):
        for year in backfill_years(today.year - 2, today):
            out = f"{ns.output_root}/ressarcimento_{year}"
            wrote = run_guarded(
                allocation_pipeline(spark, ns.sf_dir),
                lambda df, out=out: df.write.mode("overwrite").parquet(out),
            )
            print(f"ressarcimento {year}: {'written -> ' + out if wrote else 'empty, skipped'}")
    else:
        print("ressarcimento: outside days 1-5, skipped")


if __name__ == "__main__":
    main()
