"""Schema-driven profiling — the reference's reflection pattern
(transforms parameterized over ``df.schema``, SURVEY.md §1) surfaced as
a data-quality operator.

``profile_columns`` computes per-column null and distinct counts for
every column (or a subset) in ONE pass: a single aggregate emitting
2·|cols| measures, then unpivoted to rows. No per-column jobs, no
collect loops — at 100 TB this is one scan + one 1-row shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """Per-column (column_name, n_nulls, n_distinct) — exact counts,
    integer-only outputs (engine-portable). One aggregate pass."""
    cols = list(columns) if columns else [f.name for f in df.schema.fields]
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', __n_{c}, __d_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (column_name, n_nulls, n_distinct)"
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Schema + statistics drift between two snapshots of a table
    (e.g. two ``sinks.versioned`` versions): one row per column with
    its status — ``added`` / ``removed`` / ``type_changed`` /
    ``present`` — and, for columns present on both sides, the old/new
    row, null, and distinct counts so monitoring can alert on
    distribution shifts, not just schema breaks.

    Cost: one profiling aggregate per side (each a single scan) and a
    full-outer join of two |columns|-row frames — nothing scales with
    the data beyond the two scans."""
    old_types = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_types = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    shared = [
        c
        for c in new_types
        if c in old_types and (columns is None or c in columns)
    ]
    spark = old.sparkSession
    o = (
        profile_columns(old, shared)
        .withColumnsRenamed({"n_nulls": "old_n_nulls", "n_distinct": "old_n_distinct"})
        .crossJoin(old.agg(F.count("*").alias("old_n_rows")))
    )
    n = (
        profile_columns(new, shared)
        .withColumnsRenamed({"n_nulls": "new_n_nulls", "n_distinct": "new_n_distinct"})
        .crossJoin(new.agg(F.count("*").alias("new_n_rows")))
    )
    status_rows = [
        (
            c,
            "added"
            if c not in old_types
            else "removed"
            if c not in new_types
            else "type_changed"
            if old_types[c] != new_types[c]
            else "present",
            old_types.get(c),
            new_types.get(c),
        )
        for c in dict.fromkeys([*old_types, *new_types])
        if columns is None or c in columns
    ]
    status = spark.createDataFrame(
        status_rows, "column_name string, status string, old_type string, new_type string"
    )
    return (
        status.join(o, "column_name", "left")
        .join(n, "column_name", "left")
    )


def categorical_entropy(
    df: DataFrame, columns: Sequence[str]
) -> DataFrame:
    """Shannon entropy (and normalized entropy) of low-cardinality
    columns — the screening statistic for degenerate / near-constant
    features and for spotting drift in label distributions.

    One row per profiled column: (column_name, n, n_distinct,
    entropy_micro) with entropy = -sum p ln p in nats, emitted
    micro-scaled (``round(x*1e6)::bigint``) because JVM and libm ``ln``
    can disagree by 1 ulp — the 1e-6 quantum makes the value
    bit-stable across engines while keeping six decimals.

    Scale shape: one grouped count per column over a single unpivot
    scan (the per-column category counts are tiny), then a per-column
    fold — no driver loops, no collect.
    """
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in columns
                ]
            )
        ).alias("kv")
    ).select("kv.column_name", "kv.val")
    counts = stacked.groupBy("column_name", "val").agg(
        F.count("*").alias("__c")
    )
    per_col = counts.groupBy("column_name").agg(
        F.sum("__c").alias("n"), F.count("*").alias("n_distinct"),
        F.sum(
            F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
        ).alias("__sum_clnc"),
    )
    # -sum p ln p = ln n - (sum c ln c)/n
    ent = (
        F.log(F.col("n").cast("double"))
        - F.col("__sum_clnc") / F.col("n").cast("double")
    )
    return per_col.select(
        "column_name",
        "n",
        "n_distinct",
        F.round(ent * 1e6).cast("long").alias("entropy_micro"),
    )
