"""Slowly-changing-dimension maintenance (SCD Type 2).

The classic warehouse pattern: a dimension table keeps FULL HISTORY —
each key's row is closed out (``valid_to`` stamped, ``is_current``
false) when its attributes change, and a new current row opens. Joins
against facts then pick the row valid at the fact's timestamp.

``scd2_apply`` is a PURE DataFrame transform: (history, snapshot) ->
new history. Storage is the caller's choice — persist each result as a
snapshot of the versioned store (``sinks.versioned``) for time travel
over the history table itself, or overwrite a plain path. Keeping the
operator storage-free makes it SQL-oracle-able and composable (fold a
sequence of snapshots through it).

Scale shape: ONE full-outer join per apply between the CURRENT slice
and the incoming snapshot (history rows pass through untouched — they
are immutable by definition), then a per-row conditional expansion
(array + explode, map-side). No window, no collect; the join shuffles
on the dimension key.

Timestamps are caller-supplied literals (``as_of``), so a rebuild from
the same snapshots is bit-identical — never wall-clock inside the
operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_apply(
    history: DataFrame | None,
    snapshot: DataFrame,
    keys: Sequence[str],
    as_of: str,
    close_missing: bool = False,
) -> DataFrame:
    """Fold one source ``snapshot`` (taken at ``as_of``, an ISO string)
    into an SCD2 ``history`` table.

    - new key -> open a current row (valid_from=as_of);
    - changed payload (NULL-safe struct compare) -> close the old
      current row (valid_to=as_of) and open a new one;
    - unchanged -> current row passes through;
    - key missing from the snapshot -> closed when ``close_missing``
      (the "dimension member deleted" policy), else left current.

    ``history=None`` bootstraps from the snapshot. Returns the full
    new history (closed rows + current rows)."""
    keys = list(keys)
    payload = [c for c in snapshot.columns if c not in keys]
    meta_bootstrap = [
        F.lit(as_of).alias(VALID_FROM),
        F.lit(None).cast("string").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    ]
    if history is None:
        return snapshot.select(*keys, *payload, *meta_bootstrap)

    closed = history.filter(~F.col(IS_CURRENT))
    cur = history.filter(F.col(IS_CURRENT))

    c = cur.select(
        *[F.col(k).alias(f"__ck_{k}") for k in keys],
        F.struct(*payload).alias("__cp"),
        F.col(VALID_FROM).alias("__cfrom"),
        F.lit(True).alias("__c_present"),
    )
    s = snapshot.select(
        *keys,
        F.struct(*payload).alias("__sp"),
        F.lit(True).alias("__s_present"),
    )
    cond = [s[k].eqNullSafe(c[f"__ck_{k}"]) for k in keys]
    j = s.join(c, cond, "full_outer")

    out_key = [F.coalesce(s[k], c[f"__ck_{k}"]).alias(k) for k in keys]

    def row(pay, vfrom, vto, is_cur):
        return F.struct(
            pay.alias("__p"),
            vfrom.alias(VALID_FROM),
            vto.alias(VALID_TO),
            is_cur.alias(IS_CURRENT),
        )

    as_of_lit = F.lit(as_of)
    null_to = F.lit(None).cast("string")
    cur_row = row(F.col("__cp"), F.col("__cfrom"), null_to, F.lit(True))
    closed_cur = row(F.col("__cp"), F.col("__cfrom"), as_of_lit, F.lit(False))
    new_row = row(F.col("__sp"), as_of_lit, null_to, F.lit(True))

    rows = (
        F.when(
            F.col("__c_present").isNull(), F.array(new_row)  # brand-new key
        )
        .when(
            F.col("__s_present").isNull(),  # key absent from snapshot
            F.array(closed_cur) if close_missing else F.array(cur_row),
        )
        .when(
            F.col("__sp").eqNullSafe(F.col("__cp")), F.array(cur_row)
        )
        .otherwise(F.array(closed_cur, new_row))  # changed: close + open
    )
    exploded = j.select(*out_key, F.explode(rows).alias("__r"))
    expanded = exploded.select(
        *keys,
        *[F.col("__r.__p").getField(p).alias(p) for p in payload],
        F.col(f"__r.{VALID_FROM}").alias(VALID_FROM),
        F.col(f"__r.{VALID_TO}").alias(VALID_TO),
        F.col(f"__r.{IS_CURRENT}").alias(IS_CURRENT),
    )
    return closed.select(*keys, *payload, VALID_FROM, VALID_TO, IS_CURRENT).unionByName(
        expanded
    )


def scd2_as_of(history: DataFrame, at: str) -> DataFrame:
    """The dimension as it was at ``at``: rows whose validity interval
    covers the instant (valid_from <= at < valid_to, open-ended
    current rows included). Pure filter — pushes to the scan."""
    return history.filter(
        (F.col(VALID_FROM) <= F.lit(at))
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > F.lit(at)))
    )
