"""Composite domain operators: full-outer reconciliation and
proportional allocation (SURVEY.md §2 J8 / F9, Phase-2 items).

These generalize the reference's ressarcimento semantics
(utils_ressarcimento.py:250-270) with the NULL/zero behavior pinned:

- ``allocate_proportional``: each fact row receives
  ``coalesce(weight / nullif(total, 0) * amount, amount, 0)``.
  When the group total is NULL or 0 the division yields NULL and the
  cascade falls through to the full ``amount`` (the reference's intended
  "orphan credit passes through whole" semantic — there it arises from
  non-ANSI div-by-zero → NULL; we write ``nullif`` so the same result
  holds under ANSI mode and in any SQL engine).

- ``reconcile_full_outer``: matched rows ∪ right-only ∪ left-only. The
  reference builds this from two left-anti joins + unionByName
  (utils_ressarcimento.py:256-270); we offer that faithful 3-branch form
  (``style='anti_union'``) and the idiomatic single full-outer join
  (``style='full_outer'``) — one shuffle instead of three joins —
  which is the right plan at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .setops import union_by_name


def allocate_proportional(
    df: DataFrame,
    weight: Column | str,
    total: Column | str,
    amount: Column | str,
    alias: str,
) -> DataFrame:
    """Allocate ``amount`` to each row proportionally to ``weight/total``,
    falling back to the whole ``amount`` when the denominator is NULL/0,
    and 0 when ``amount`` is NULL."""
    w = F.col(weight) if isinstance(weight, str) else weight
    t = F.col(total) if isinstance(total, str) else total
    a = F.col(amount) if isinstance(amount, str) else amount
    share = w / F.nullif(t, F.lit(0)) * a
    return df.withColumn(alias, F.coalesce(share, a, F.lit(0)))


def reconcile_full_outer(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    style: str = "full_outer",
) -> DataFrame:
    """Matched ∪ left-only ∪ right-only on ``keys``.

    ``style='full_outer'``: single full-outer join with key columns
    coalesced — one shuffle, the scalable plan.
    ``style='anti_union'``: inner ∪ (left anti right) ∪ (right anti left)
    via unionByName null-widening — reference-faithful 3-branch form.
    Both produce the same rows; column order may differ.
    """
    keys = list(keys)
    if style == "anti_union":
        matched = left.join(right, keys, "inner")
        left_only = left.join(right, keys, "left_anti")
        right_only = right.join(left, keys, "left_anti")
        return union_by_name(matched, left_only, right_only)
    if style == "full_outer":
        joined = left.alias("l").join(right.alias("r"), keys, "full_outer")
        # after a USING-style full outer join Spark already coalesces the
        # key columns into one; remaining columns come from both sides.
        return joined
    raise ValueError(f"unknown style: {style}")
