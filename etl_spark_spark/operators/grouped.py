"""Grouped-map operators (``applyInPandas``).

For per-group logic that windows/aggregates can't express — model
fits, solver calls, per-entity algorithms — Spark ships each group to
Python as ONE Arrow-backed pandas frame. Contract at scale: group
cardinality bounded (a group must fit in one task's memory), groups
hash-shuffle once on the key, and the Python work is vectorized numpy
per group, not per row.

``fit_group_trend`` is the template instance: an OLS slope/intercept
per key over (x, y) pairs — e.g. per-user value drift over event time.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_group_trend(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key least-squares fit of y on x.

    Returns one row per key: (keys..., n, slope, intercept). x is
    centered per group before the solve for numerical stability (event
    timestamps are ~1e15 µs). Groups with a degenerate x (single point
    or zero variance) yield NULL slope/intercept.
    """
    import numpy as np

    keys = list(keys)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = f"{key_schema}, n long, slope double, intercept double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["n"] = [len(pdf)]
        xc = x - x.mean()
        denom = float((xc * xc).sum())
        if len(pdf) < 2 or denom == 0.0:
            row["slope"] = [None]
            row["intercept"] = [None]
        else:
            slope = float((xc * y).sum()) / denom
            row["slope"] = [slope]
            row["intercept"] = [float(y.mean()) - slope * float(x.mean())]
        return pd.DataFrame(row)

    return df.select(*keys, x_col, y_col).groupBy(*keys).applyInPandas(
        fit, schema=out_schema
    )


def fit_group_trend_exact_sql(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    y_scale: int = 2,
) -> DataFrame:
    """Expression-only variant of ``fit_group_trend_exact``: the same
    exact sufficient statistics, but summed as Spark decimals
    (decimal(38,0) holds Σx² for epoch-µs x: ~3e30 ≪ 1e38) inside one
    hash aggregate — no Python worker at all, which removes the ~2-3 s
    Arrow/worker startup the applyInPandas form pays and keeps the
    whole plan in codegen. Bit-identical to the applyInPandas form and
    to the HUGEINT SQL oracle: integer sums are exact in any order, and
    the final slope/intercept use the same fixed IEEE op sequence
    (decimal->double casts are correctly rounded in both engines).
    Returns (keys..., n, slope, intercept) with NULLs for degenerate
    (zero x-variance) groups.

    Range contract: needs n²·x² < 1e38 per group (ANSI mode fails loud,
    not silently, beyond it). With epoch-MILLIS x that allows ~5.8M
    rows per group; pass epoch-µs only for small groups. The
    applyInPandas form (Python bigints) has no such bound — use it for
    pathological group sizes."""
    factor = 10**y_scale
    keys = list(keys)
    x = F.col(x_col).cast("decimal(38,0)")
    yc = F.round(
        (F.col(y_col) if isinstance(y_col, str) else y_col) * factor
    ).cast("decimal(38,0)")
    s = df.select(*keys, x.alias("__x"), yc.alias("__yc")).groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__yc").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__yc")).alias("__sxy"),
    )
    nn = F.col("n").cast("decimal(38,0)")
    num = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    den = (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    fac = F.lit(float(factor))
    nd = F.col("n").cast("double")
    slope = num / F.nullif(den, F.lit(0.0)) / fac
    sxd = F.col("__sx").cast("double")
    syd = F.col("__sy").cast("double")
    intercept = syd / fac / nd - slope * (sxd / nd)
    return s.select(
        *keys, "n", slope.alias("slope"), intercept.alias("intercept")
    )


def fit_group_trend_exact(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    y_scale: int = 2,
) -> DataFrame:
    """Per-key OLS with EXACT sufficient statistics: bit-reproducible
    across engines, partitionings, and row orders.

    Floating-point regression is order-dependent (and DuckDB's
    regr_slope uses a different accumulation than numpy — they agree
    only to ~1e-6). Here x must be integral (e.g. epoch µs) and y
    money-like; each group's five sufficient statistics (n, Σx, Σy,
    Σx², Σxy) are summed in arbitrary-precision Python integers — exact
    and associative, so any shuffle/merge order yields the same bits —
    and slope/intercept come from a FIXED IEEE op sequence over
    correctly-rounded int→double casts. An ANSI-SQL mirror with HUGEINT
    sums produces bit-identical doubles, which is what the oracle
    check pins.

    Same applyInPandas shape as ``fit_group_trend`` (one Arrow frame
    per group, one shuffle on the keys); the exact path trades numpy
    vectorization for arbitrary precision — still a single O(n) pass
    per group. Degenerate groups (zero x-variance, incl. n=1) yield
    NULL slope/intercept. Returns (keys..., n, slope, intercept).
    """
    factor = 10**y_scale

    keys = list(keys)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = f"{key_schema}, n long, slope double, intercept double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf["__x"]]
        ys = [int(v) for v in pdf["__yc"]]
        n = len(xs)
        sx = sum(xs)
        sy = sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["n"] = [n]
        if den == 0:
            row["slope"] = [None]
            row["intercept"] = [None]
        else:
            slope = float(num) / float(den) / float(factor)
            row["slope"] = [slope]
            row["intercept"] = [
                float(sy) / float(factor) / float(n)
                - slope * (float(sx) / float(n))
            ]
        return pd.DataFrame(row)

    base = df.select(
        *keys,
        F.col(x_col).cast("long").alias("__x"),
        F.round(
            (F.col(y_col) if isinstance(y_col, str) else y_col) * factor
        )
        .cast("long")
        .alias("__yc"),
    )
    return base.groupBy(*keys).applyInPandas(fit, schema=out_schema)


def transition_counts(
    df: DataFrame,
    part_col: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition table: for each entity's event
    sequence (ordered by ``order_cols`` — include a unique tiebreaker
    so the order is total), count (from_state, to_state) adjacencies
    and their within-from probability. One shuffle on the entity key
    for the lag window, one aggregate; ``p`` is an exact integer/
    integer division (deterministic IEEE, engine-portable)."""
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(*order_cols)
    steps = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_state")
    return steps.select(
        "from_state",
        "to_state",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(w_from).cast("double")
        ).alias("p"),
    )


def activity_streaks(df: DataFrame, id_col: str, ts_col: str) -> DataFrame:
    """Gaps-and-islands per entity over calendar days: distinct active
    days, grouped into runs of consecutive days by the classic
    day_number - row_number() constant. Returns per entity
    (active_days, n_streaks, longest_streak). The row_number window is
    partitioned by the entity (bounded groups); everything else is
    hash aggregation."""
    from pyspark.sql import Window

    days = df.select(
        F.col(id_col), F.to_date(ts_col).alias("day")
    ).distinct()
    w = Window.partitionBy(id_col).orderBy("day")
    grp = days.select(
        id_col,
        "day",
        (
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = grp.groupBy(id_col, "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy(id_col).agg(
        F.sum("len").alias("active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


def welch_t_test(
    df: DataFrame,
    group_cols: Sequence[str],
    cents_col: str,
    variant_col: str,
    variant_a: str = "A",
) -> DataFrame:
    """Distributed EXACT Welch two-sample t-test per group: the
    sufficient statistics (n, sum, sum-of-squares) are integer sums of
    the fixed-point measure (associative — any shuffle order gives the
    same bits), and the final t / degrees-of-freedom arithmetic is a
    fixed IEEE double sequence an oracle can mirror term-for-term
    (same shape as ``corr_exact``: decimal -> double casts are
    correctly rounded). Two variants per group, conditional
    aggregation, a single pass."""
    keys = list(group_cols)
    is_a = F.col(variant_col) == F.lit(variant_a)
    x = F.col(cents_col)
    s = df.groupBy(*keys).agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(~is_a, 1)).alias("n_b"),
        F.coalesce(F.sum(F.when(is_a, x)), F.lit(0)).alias("sa"),
        F.coalesce(F.sum(F.when(~is_a, x)), F.lit(0)).alias("sb"),
        F.coalesce(
            F.sum(F.when(is_a, (x * x).cast("decimal(38,0)"))), F.lit(0)
        ).cast("decimal(38,0)").alias("ssa"),
        F.coalesce(
            F.sum(F.when(~is_a, (x * x).cast("decimal(38,0)"))), F.lit(0)
        ).cast("decimal(38,0)").alias("ssb"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dbl = lambda e: e.cast("double")  # noqa: E731
    mean_a = dbl(F.col("sa")) / dbl(F.col("n_a"))
    mean_b = dbl(F.col("sb")) / dbl(F.col("n_b"))
    var_a = dbl(dec("n_a") * F.col("ssa") - dec("sa") * dec("sa")) / dbl(
        F.col("n_a") * (F.col("n_a") - F.lit(1))
    )
    var_b = dbl(dec("n_b") * F.col("ssb") - dec("sb") * dec("sb")) / dbl(
        F.col("n_b") * (F.col("n_b") - F.lit(1))
    )
    se_a = var_a / dbl(F.col("n_a"))
    se_b = var_b / dbl(F.col("n_b"))
    se2 = se_a + se_b
    t = (mean_a - mean_b) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (se_a * se_a) / dbl(F.col("n_a") - F.lit(1))
        + (se_b * se_b) / dbl(F.col("n_b") - F.lit(1))
    )
    return s.filter((F.col("n_a") > 1) & (F.col("n_b") > 1)).select(
        *keys,
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        t.alias("t_stat"),
        dfw.alias("welch_df"),
    )
