"""Privacy audits for training-data release: k-anonymity and
l-diversity over quasi-identifier combinations, plus the standard
suppression step.

The pipeline question this answers: q_doc_pii_scrub removes DIRECT
identifiers (emails, phones) from text, but a released corpus can
still re-identify people through QUASI-identifier metadata — the
classic result (Sweeney 2000) is that (zip, birthdate, sex) uniquely
identifies ~87% of the US population. k-anonymity (Sweeney 2002)
demands every released quasi-identifier combination be shared by at
least k rows; l-diversity (Machanavelli et al. 2007) additionally
demands each class contain at least l distinct values of a sensitive
attribute (a k-anonymous class whose members ALL share one diagnosis
still leaks it).

Spark shape: one hash aggregate to the equivalence classes (the
decisive shrink — class count is bounded by the quasi domain, not
row count), everything downstream operates on classes. Suppression
is a broadcast-size anti-join of the unsafe class keys back onto the
rows (AQE picks the strategy; class tables at realistic
generalization levels are tiny). All exact integer counts — any SQL
engine reproduces them bit-for-bit.

No reference counterpart (533-line hard-coded ETL); §7 LLM-pipeline
extension alongside scrub_pii (functions/scrub.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anonymity_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Equivalence classes of the quasi-identifier combination:
    (quasi_cols..., class_size[, l_diversity]). NULL quasi values are
    a real class (groupBy semantics, consistent with ANSI GROUP BY) —
    a NULL zip code still narrows re-identification. ``l_diversity``
    counts distinct non-NULL sensitive values."""
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("l_diversity")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_summary(
    classes: DataFrame, k: int, min_l: int | None = None
) -> DataFrame:
    """One-row release-gate report over an :func:`anonymity_classes`
    table: (n_classes, n_unsafe_classes, n_exposed_rows,
    min_class_size[, min_l_diversity]). A class is unsafe when
    class_size < k, or (if ``min_l`` is set and the classes carry
    l_diversity) when l_diversity < min_l."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    unsafe = F.col("class_size") < F.lit(int(k))
    if min_l is not None:
        if "l_diversity" not in classes.columns:
            raise ValueError(
                "min_l requires classes built with a sensitive_col"
            )
        unsafe = unsafe | (F.col("l_diversity") < F.lit(int(min_l)))
    aggs = [
        F.count("*").alias("n_classes"),
        F.sum(F.when(unsafe, 1).otherwise(0)).cast("long").alias(
            "n_unsafe_classes"
        ),
        F.sum(F.when(unsafe, F.col("class_size")).otherwise(0)).cast(
            "long"
        ).alias("n_exposed_rows"),
        F.min("class_size").alias("min_class_size"),
    ]
    if min_l is not None:
        aggs.append(F.min("l_diversity").alias("min_l_diversity"))
    return classes.agg(*aggs)


def suppress_unsafe_classes(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """The standard suppression step: drop every row whose
    quasi-identifier class has fewer than ``k`` members — the released
    remainder is k-anonymous BY CONSTRUCTION on those columns.
    Null-safe on the class keys (a NULL-valued class is suppressed
    like any other when small). Prefer COARSENING the quasi columns
    first (length bands, truncated geo) — suppression trades data for
    safety; the summary's n_exposed_rows prices that trade before you
    take it."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    keys = list(quasi_cols)
    unsafe = (
        anonymity_classes(df, keys)
        .filter(F.col("class_size") < F.lit(int(k)))
        .select(*keys)
    )
    lhs, rhs = df.alias("__pvl"), unsafe.alias("__pvr")
    cond = None
    for c in keys:
        e = F.col(f"__pvl.{c}").eqNullSafe(F.col(f"__pvr.{c}"))
        cond = e if cond is None else (cond & e)
    return lhs.join(rhs, cond, "left_anti").select(
        *[F.col(f"__pvl.{c}") for c in df.columns]
    )
