"""Incremental-run orchestration (SURVEY.md §2 P15/F12, Phase 2.3).

Generalizes the reference's driver-side scheduling logic
(etl_job.py:87-125): the daily date window with the days-1-5
month-rollback rule, the year-backfill loop, and the empty-result
guard — kept as plain Python orchestration (it gates plan execution;
it is not itself a plan node), but with the guard moved from a
collected-pandas ``.empty`` check to ``DataFrame.isEmpty()`` (a
limit-1 job — no driver materialization).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def date_window(
    today: dt.date, rollback_day_limit: int = 5
) -> tuple[dt.date, dt.date]:
    """[start, end] for an incremental run: month-to-date, except in the
    first ``rollback_day_limit`` days of a month, when the window rolls
    back to cover the previous month (late-arriving data for the close
    of the prior month — reference etl_job.py:121-125)."""
    end = today
    start = end.replace(day=1)
    if end.day <= rollback_day_limit:
        last_of_prev = start - dt.timedelta(days=1)
        start = last_of_prev.replace(day=1)
    return start, end


def should_run_monthly(today: dt.date, day_range: tuple[int, int] = (1, 5)) -> bool:
    """Gate for month-start jobs (reference etl_job.py:91)."""
    lo, hi = day_range
    return lo <= today.day <= hi


def backfill_years(start_year: int, today: dt.date) -> Iterator[int]:
    """Years to (re)build, oldest first (reference etl_job.py:95)."""
    return iter(range(start_year, today.year + 1))


def run_guarded(
    df: DataFrame,
    sink: Callable[[DataFrame], None],
) -> bool:
    """Run ``sink`` only when the result is non-empty. Uses isEmpty()
    (a limit-1 job) instead of collecting (reference etl_job.py:102
    collects to pandas just to check .empty). Returns True if written."""
    if df.isEmpty():
        return False
    sink(df)
    return True
