"""End-to-end jobs: the reference's two scheduled pipelines, composed
from this engine's operators with Spark-native sinks.

Reference parity (etl_job.py:28-114 in /root/reference):
- superdesconto job: build the best-sale view, MERGE into the target
  keyed on etiqueta (reference: collect to pandas -> Athena MERGE,
  etl_job.py:68-85; here: executor-side keyed upsert).
- ressarcimento backfill: gated to month-start days, one run per year
  since ``start_year``; first year replaces the target, later years
  append (reference etl_job.py:91-110), each run guarded on
  non-emptiness via isEmpty() rather than a driver collect.

Both jobs take the date/gate context as plain arguments so they are
trivially schedulable (cron/Airflow/Workflows) and testable.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sinks import upsert, write
from .incremental import backfill_years, date_window, run_guarded, should_run_monthly
from .ressarcimento import allocation_pipeline
from .superdesconto import best_sale_pipeline


def run_superdesconto_job(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    today: dt.date | None = None,
) -> int:
    """Daily best-sale MERGE: compute the window for ``today`` (with
    month-rollback), restrict the feed to it, upsert on etiqueta.
    Returns the number of rows merged."""
    today = today or dt.date.today()
    start, end = date_window(today)
    view = best_sale_pipeline(spark, sf_dir, start=start, end=end)
    # cache: the guard count plus upsert's anti-join and union branches
    # would otherwise each re-execute the full pipeline (3 scans)
    view = view.persist()
    try:
        n = view.count()
        if n:
            upsert(spark, view, target_path, keys=["etiqueta"])
    finally:
        view.unpersist()
    return n


def run_ressarcimento_backfill(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    today: dt.date,
    start_year: int = 2023,
    force: bool = False,
) -> list[int]:
    """Month-start backfill: one allocation run per year; replace on
    the first year, append after; empty years skipped. Returns the
    years actually written. ``force`` bypasses the day-of-month gate
    (the reference's gate is cron + code; ours is testable)."""
    if not force and not should_run_monthly(today):
        return []
    written: list[int] = []
    first = True
    for year in backfill_years(start_year, today):
        result = allocation_pipeline(spark, sf_dir)
        # fixture allocation is year-independent; a real deployment
        # parameterizes the loss/credit scans by year (the reference
        # filters year(ts)==ano, utils_ressarcimento.py:115) — we tag
        # the output instead so appended years stay distinguishable
        result = result.withColumn("ano", F.lit(year))
        mode = "overwrite" if first else "append"
        if run_guarded(result, lambda df, m=mode: write(df, target_path, mode=m)):
            written.append(year)
            first = False
    return written
