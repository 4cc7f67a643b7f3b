"""Analytic-window operators.

- ``top_k_per_group`` — the reference's "best discounted sale per barcode"
  pattern (utils_superdesconto.py:91-98): row_number over a partitioned
  ordering, keep rank <= k. One shuffle on the partition keys.
- ``partitioned_sum`` — group total without collapsing rows (the
  ``sum(x) over (partition by g)`` denominator at
  utils_ressarcimento.py:229), accepted as API columns or a SQL string
  via ``F.expr`` (the reference uses both styles).

Scale note: an unbounded window over a hot key concentrates that key's
rows on one task. For top-k with few columns and heavy skew, prefer
aggregating ``max_by``/sorted structs; AQE skew handling does not split
window partitions. ``top_k_per_group`` is fine when the per-key row count
is bounded (true for all reference-shaped workloads).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int = 1,
    rank_col: str = "__rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the top-``k`` rows per group under ``order_by``.

    Include a unique tiebreaker in ``order_by`` for deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def top_one_per_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_struct: Column,
) -> DataFrame:
    """Top-1 per group as a hash aggregate (``max_by``) instead of a
    ranking window.

    Semantically identical to ``top_k_per_group(k=1)`` with a
    descending-lexicographic ordering on ``order_struct`` (a struct
    column where LARGER compares as better; negate numeric components
    to flip direction, e.g. ``F.struct(score, -ts, -id)`` = max score,
    ties to smallest ts then id).

    Why it matters at scale: a window must shuffle EVERY row to its
    key's partition and sort it; max_by partial-aggregates map-side, so
    only ~one row per key per mapper crosses the shuffle. At 100 TB /
    1000 executors that is the difference between shuffling the whole
    fact table and shuffling ~|keys| rows.
    """
    keys = list(keys)
    payload = F.struct(*[c for c in df.columns if c not in keys])
    agg = df.groupBy(*keys).agg(F.max_by(payload, order_struct).alias("__best"))
    return agg.select(*keys, "__best.*")


def partial_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_struct: Column,
    k: int,
    n_salts: int = 64,
) -> DataFrame:
    """Skew-safe top-``k`` per key for k > 1 — the two-phase aggregate
    form of ``top_k_per_group`` (which see for the k=1 ``max_by``
    variant rationale).

    ``order_struct`` follows the ``top_one_per_group_agg`` convention:
    a struct where LARGER compares as better, including a unique
    tiebreaker (negate components to flip direction).

    When to use (measured, scripts/bench_skew.py): for the plain
    ``row_number + filter(rn <= k)`` shape, PREFER THE WINDOW — Spark
    >= 3.5 plans it with WindowGroupLimit, which prunes every map
    partition to its per-key top-k before the exchange, so even a key
    holding 60%+ of the data ships only ~n_mappers x k rows; this
    operator's collect_list object aggregation measured ~2.5x slower
    on a zipf replica. partial_topk remains for ordering semantics
    WindowGroupLimit cannot express — a top-k whose measure is derived
    inside the same grouped pass, engines without the rule, or a k
    large relative to per-mapper key cardinality (map-side pruning
    then keeps ~every row and the hot-key sort returns). Phase 1
    groups by (key, salt) so a hot key spreads over ``n_salts``
    reducers, each emitting at most k rows; phase 2 merges at most
    ``n_salts * k`` rows per key — bounded regardless of skew. Top-k
    is a semilattice merge, so the result is identical for any salt
    assignment; the salt is a row-content hash only to keep it
    deterministic.
    """
    keys = list(keys)
    payload = F.struct(*[c for c in df.columns if c not in keys])
    ranked = F.struct(order_struct.alias("o"), payload.alias("p"))
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    topk = lambda c: F.slice(F.sort_array(c, asc=False), 1, k)  # noqa: E731
    phase1 = df.groupBy(*keys, salt.alias("__salt")).agg(
        topk(F.collect_list(ranked)).alias("__top")
    )
    phase2 = phase1.groupBy(*keys).agg(
        topk(F.flatten(F.collect_list("__top"))).alias("__top")
    )
    return phase2.select(*keys, F.explode("__top").alias("__r")).select(
        *keys, "__r.p.*"
    )


def partitioned_sum(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    value: Column | str,
    alias: str,
) -> DataFrame:
    """Attach the per-group sum of ``value`` to every row (no collapse)."""
    value_col = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*partition_by)
    return df.withColumn(alias, F.sum(value_col).over(w))


def partitioned_sum_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    value: Column | str,
    alias: str,
    broadcast: bool = False,
) -> DataFrame:
    """Skew-immune form of :func:`partitioned_sum`: per-group totals as
    a hash AGGREGATE joined back, instead of a window.

    Why it matters at scale: ``sum(x) over (partition by g)`` lands
    every row of a group on ONE task, and AQE cannot split window
    partitions — one dominant group (the ressarcimento hazard: a single
    supplier hierarchy holding most of the losses) serializes the whole
    stage. Here the totals aggregate partial-combines map-side (skew
    collapses into one row per group per map task) and the totals table
    is group-cardinality-sized.

    The join-back strategy is AQE's by default (``broadcast=False``):
    a fact-scale group key (l_partkey in part_share_alloc) makes the
    totals table itself fact-scaling, and a forced broadcast of it is
    an OOM at the 100 TB design point — AQE broadcasts only while the
    side is actually under the threshold and otherwise falls back to a
    shuffle join whose skew IT can split (unlike a window partition).
    Pass ``broadcast=True`` only when the group cardinality is bounded
    by construction (enum-like keys, calendar grains) — that pins the
    zero-fact-shuffle plan shape regardless of stats.

    Identical values to the window form for any input, including NULL
    group keys (null-safe join keeps the window's NULL-is-a-group
    semantics). ``partition_by`` must be column NAMES (the join-back
    needs them addressable). Column order: input columns then
    ``alias``, same as the window form.
    """
    keys = list(partition_by)
    value_col = F.col(value) if isinstance(value, str) else value
    left = df.alias("__psl")
    totals = (
        df.groupBy(*keys).agg(F.sum(value_col).alias(alias)).alias("__pst")
    )
    if broadcast:
        totals = F.broadcast(totals)
    cond = None
    for k in keys:
        c = F.col(f"__psl.{k}").eqNullSafe(F.col(f"__pst.{k}"))
        cond = c if cond is None else (cond & c)
    return left.join(totals, cond, "left").select(
        *[F.col(f"__psl.{c}") for c in df.columns],
        F.col(f"__pst.{alias}").alias(alias),
    )


def _monotone_lead_key(
    order_by: Sequence[Column | str], op_name: str
) -> Column:
    """The LEADING order expression, for the monotone-bucket guard.
    Only the first key is aggregated: the contract is that the bucket
    COARSENS the leading order expression (hour-of-ts when ordering
    by ts), so adjacent buckets must not share or interleave leading-
    key values — later keys are tie-breakers WITHIN a leading-key
    value, which by that same contract never spans buckets. Checking
    the raw leading column instead of a struct of all keys keeps the
    guard's per-row aggregate cost near zero (measured: a struct
    min/max over 5M rows cost ~67% extra wall; the plain column is
    noise). All items must be PLAIN ascending expressions — a
    SortOrder (``.desc()``/``.asc()``) can be neither aggregated nor
    negated generically, so the guard rejects it with instructions
    (descending numeric orders are expressed by negating the
    expression, which the repo's own call sites do)."""
    cols = []
    for c in order_by:
        cc = F.col(c) if isinstance(c, str) else c
        s = str(cc)
        if " DESC" in s or " ASC" in s:
            raise ValueError(
                f"{op_name}: order_by items must be plain ascending "
                f"expressions (got a sort order: {s}); express a "
                "descending numeric order by negating the expression "
                "so the monotone-bucket guard can compare order keys "
                "across buckets"
            )
        cols.append(cc)
    return cols[0]


def _checked_offset(off: Column, op_name: str) -> Column:
    """Wrap a bucket-offset expression so it raises LOUDLY when the
    previous bucket's last order key (``__pox``, lagged per-bucket max
    of the order struct) reaches into this bucket's first (``__om``,
    per-bucket min) — i.e. the bucket expression is NOT monotone in
    the global order and the prefix decomposition would silently
    interleave buckets (round-12: the same loud-guard discipline as
    max_points/max_series; previously a docstring-only contract)."""
    return F.when(
        F.col("__pox").isNotNull() & (F.col("__pox") >= F.col("__om")),
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op_name}: bucket_col is not monotone in "
                    "order_by — bucket "
                ),
                F.col("__bkt").cast("string"),
                F.lit(
                    " starts at or before the previous bucket's last "
                    "order key; derive the bucket from the leading "
                    "order expression (e.g. hour-of-ts when ordering "
                    "by ts)"
                ),
            )
        ),
    ).otherwise(off)


def scalable_running_sum(
    df: DataFrame,
    bucket_col: Column | str,
    order_by: Sequence[Column | str],
    value_col: Column | str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Global running sum WITHOUT a single-partition window — the
    distributed prefix-sum decomposition:

    1. within-bucket prefix sums (windows partitioned by ``bucket_col``
       — fully parallel);
    2. per-bucket totals, offset by an exclusive running sum over the
       TINY bucket-totals table (the only serial window, sized by the
       bucket count, not the row count);
    3. offsets broadcast back: global prefix = within + offset.

    Requirements: ``bucket_col`` must be monotone in the global
    ordering (e.g. an hour bucket when ordering by timestamp) — this
    is ENFORCED (round-12): per-bucket min/max of the order tuple ride
    the totals aggregate and adjacent buckets that overlap raise
    loudly instead of silently interleaving the prefix. ``order_by``
    must be a total order within buckets (plain ascending expressions;
    negate numerics for descending) or the prefix is
    partition-dependent. A naive ``Window.orderBy(ts)`` with no
    partitionBy computes the same thing on ONE task — the classic
    sweep-line scale bug this operator exists to avoid.
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    okey = _monotone_lead_key(order_by, "scalable_running_sum")
    tagged = df.withColumn("__bkt", b).withColumn("__val", v)
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged.withColumn("__within", F.sum("__val").over(w_in))
    totals = tagged.groupBy("__bkt").agg(
        F.sum("__val").alias("__t"),
        F.min(okey).alias("__om"),
        F.max(okey).alias("__ox"),
    )
    w_b = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lag = Window.orderBy("__bkt")
    offsets = totals.select(
        "__bkt",
        F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__off"),
        F.lag("__ox").over(w_lag).alias("__pox"),
        "__om",
    ).select(
        "__bkt",
        _checked_offset(F.col("__off"), "scalable_running_sum").alias(
            "__off"
        ),
    )
    return (
        within.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__within") + F.col("__off"))
        .drop("__bkt", "__val", "__within", "__off")
    )


def scalable_running_max(
    df: DataFrame,
    bucket_col: Column | str,
    order_by: Sequence[Column | str],
    value_col: Column | str,
    out_col: str = "running_max",
) -> DataFrame:
    """Global running max without a single-partition window — the same
    prefix decomposition as ``scalable_running_sum`` (max is equally
    associative): within-bucket prefix maxima in parallel, an exclusive
    running max over the tiny bucket-maxima table, then
    ``greatest(within, offset)``. Same monotone-bucket requirement,
    same loud guard (round-12)."""
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    okey = _monotone_lead_key(order_by, "scalable_running_max")
    tagged = df.withColumn("__bkt", b).withColumn("__val", v)
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged.withColumn("__within", F.max("__val").over(w_in))
    totals = tagged.groupBy("__bkt").agg(
        F.max("__val").alias("__t"),
        F.min(okey).alias("__om"),
        F.max(okey).alias("__ox"),
    )
    w_b = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    w_lag = Window.orderBy("__bkt")
    offsets = totals.select(
        "__bkt",
        F.max("__t").over(w_b).alias("__off"),
        F.lag("__ox").over(w_lag).alias("__pox"),
        "__om",
    ).select(
        "__bkt",
        _checked_offset(F.col("__off"), "scalable_running_max").alias(
            "__off"
        ),
    )
    return (
        within.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            out_col,
            F.when(
                F.col("__off").isNull(), F.col("__within")
            ).otherwise(F.greatest("__within", "__off")),
        )
        .drop("__bkt", "__val", "__within", "__off")
    )


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_col: Column | str | None = None,
) -> DataFrame:
    """2-D skyline (maximization): rows not dominated by any other row
    (q dominates p iff q.x >= p.x, q.y >= p.y, and one is strict).
    Equal (x, y) duplicates dominate nothing and are all kept.

    Distributed sweep: per distinct x, the max y (hash aggregate);
    then the exclusive running max of those maxima over x DESC —
    computed as within-bucket windows plus an exclusive max over the
    tiny bucket-maxima table, never a single-task global window. A row
    is on the frontier iff its y equals its x-group max AND strictly
    exceeds the best y at any strictly larger x.

    ``bucket_col`` (default: x itself) must be monotone in x — ENFORCED
    (round-12, same loud guard as scalable_running_sum: per-bucket
    min/max of x ride the bucket-maxima aggregate and overlapping
    adjacent buckets raise); pass a coarse bucket (e.g.
    ``F.floor(F.col(x)/1000)``) when x is near-continuous so the
    serial window stays tiny.
    """
    b = (
        F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    ) if bucket_col is not None else F.col(x_col)
    groups = (
        df.withColumn("__bkt", b)
        .groupBy("__bkt", x_col)
        .agg(F.max(y_col).alias("__xmax"))
    )
    # exclusive prefix max over x DESC: one row per distinct x, so the
    # within-bucket window and the bucket-offsets table are both sized
    # by distinct-x counts, not row counts
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = groups.withColumn("__excl", F.max("__xmax").over(w_in))
    btot = groups.groupBy("__bkt").agg(
        F.max("__xmax").alias("__t"),
        F.min(x_col).alias("__om"),
        F.max(x_col).alias("__ox"),
    )
    w_b = (
        Window.orderBy(F.col("__bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lag = Window.orderBy("__bkt")
    boff = btot.select(
        "__bkt",
        F.max("__t").over(w_b).alias("__off"),
        F.lag("__ox").over(w_lag).alias("__pox"),
        "__om",
    ).select(
        "__bkt",
        _checked_offset(F.col("__off"), "pareto_frontier_2d").alias(
            "__off"
        ),
    )
    marks = (
        within.join(F.broadcast(boff), "__bkt")
        .select(
            x_col,
            "__xmax",
            # greatest() skips NULLs: null only when both are null
            F.greatest("__excl", "__off").alias("__better"),
        )
    )
    return (
        # no broadcast hint: marks is sized by distinct-x — small for
        # discrete x, so AQE picks broadcast; a hint would be wrong for
        # near-continuous x
        df.join(marks, x_col)
        .filter(
            (F.col(y_col) == F.col("__xmax"))
            & (
                F.col("__better").isNull()
                | (F.col(y_col) > F.col("__better"))
            )
        )
        .drop("__xmax", "__better")
    )
