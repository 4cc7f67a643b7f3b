"""Materialized-view routing: answer aggregates from a rollup instead
of the base table when the rollup can prove the same answer.

The lakehouse pattern this reconstructs: keep compact additive rollups
(built by ``operators.rollup.agg_snapshot``, kept fresh by
``apply_agg_delta`` from CDC deltas), and ROUTE eligible aggregate
queries to them — a query grouping by a subset of a rollup's keys and
asking only additive measures re-aggregates the rollup's partial
states instead of rescanning the base. At 100 TB the difference is a
few thousand rollup rows vs a full fact scan.

Eligibility is the textbook additive-rollup condition:

- requested group-by columns ⊆ the view's group-by columns, and
- every requested measure is one the view materialized (``count`` and
  ``sum_cents`` partials both re-aggregate with SUM — integer-exact,
  so the routed answer is BIT-identical to the base-table answer, not
  approximately equal).

Among eligible views the router picks the coarsest (fewest group
columns — fewest partial rows to fold). ``answer()`` returns the
chosen source name alongside the DataFrame so callers/tests can pin
the routing decision, and falls back to the base builder when no view
qualifies — routing is an optimization, never a semantics change.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import agg_snapshot


@dataclass(frozen=True)
class RollupView:
    """A materialized additive rollup: ``df`` holds one row per group
    with the partial states produced by ``agg_snapshot`` (longs).
    ``measures`` keeps the FULL (out -> (src col | None, kind))
    definitions, not just output names — eligibility must prove the
    view materialized the same computation, or a name collision
    (same out name, different source column or kind) would route to
    the view and silently return a different answer."""

    name: str
    group_cols: tuple[str, ...]
    measures: tuple[tuple[str, tuple[str | None, str]], ...]
    df: DataFrame

    def can_answer(
        self,
        group_cols: Sequence[str],
        measures: dict[str, tuple[str | None, str]],
    ) -> bool:
        defs = dict(self.measures)
        return set(group_cols) <= set(self.group_cols) and all(
            defs.get(out) == definition for out, definition in measures.items()
        )


def materialize_rollup(
    base: DataFrame,
    name: str,
    group_cols: Sequence[str],
    measures: dict[str, tuple[str | None, str]],
) -> RollupView:
    """Build + pin a rollup view. ``measures`` uses the
    ``agg_snapshot`` encoding (out -> (src col | None, 'count' |
    'sum_cents')). The result is localCheckpoint-pinned so routed
    queries read the materialized rows, not the base lineage; a
    production deployment writes it through ``sinks.write`` /
    ``sinks.versioned`` and refreshes with
    ``operators.rollup.apply_agg_delta`` instead."""
    df = agg_snapshot(base, list(group_cols), measures).localCheckpoint()
    return RollupView(
        name, tuple(group_cols), tuple(sorted(measures.items())), df
    )


def answer(
    views: Sequence[RollupView],
    base_builder: Callable[[], DataFrame],
    group_cols: Sequence[str],
    measures: dict[str, tuple[str | None, str]],
) -> tuple[DataFrame, str]:
    """Answer ``agg_snapshot(base, group_cols, measures)`` from the
    cheapest eligible view, else from the base. Returns
    (result, source_name) with source_name == view.name or 'base'."""
    eligible = [v for v in views if v.can_answer(group_cols, measures)]
    if not eligible:
        return agg_snapshot(base_builder(), list(group_cols), measures), "base"
    view = min(eligible, key=lambda v: (len(v.group_cols), v.name))
    rolled = view.df.groupBy(*group_cols).agg(
        *[F.sum(out).alias(out) for out in measures]
    )
    return rolled, view.name
