"""Data-quality expectations: declarative row-level rules, evaluated
in one pass, with quarantine routing (engine extension; the reference
has no validation surface — its pipelines trust their inputs, see
SURVEY.md §0).

A rule is a named boolean Column expression that should hold for every
row. Semantics are FAIL-CLOSED: a rule that evaluates to NULL (e.g. a
comparison against a NULL value) counts as a violation — data-quality
checks exist precisely to catch the rows where expressions stop
evaluating cleanly.

Scale shape: ``expectation_metrics`` folds every rule into a SINGLE
hash aggregate over one scan (map-side partial sums of 0/1 casts) —
checking 50 rules on 100 TB costs one pass, not 50. ``quarantine``
splits pass/fail rows with pure per-row expressions (no shuffle);
referential checks (``fk_violation_count``) are the one shuffling
rule, a left-anti join on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expectation_metrics",
    "fk_violation_count",
    "functional_dependencies",
    "quarantine",
]


def _violation(rule: Column) -> Column:
    """1 if the rule fails OR cannot be evaluated (NULL), else 0."""
    return F.when(rule, F.lit(0)).otherwise(F.lit(1))


def expectation_metrics(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate all rules in one aggregate pass.

    Returns one row per rule: (rule string, n_rows long, n_violations
    long). Rule order in the output follows dict order.
    """
    if not rules:
        raise ValueError("at least one rule required")
    aliased = {name: f"__v{i}" for i, name in enumerate(rules)}
    agg = df.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(_violation(rule)).cast("long").alias(aliased[name])
            for name, rule in rules.items()
        ],
    )
    stack_args = ", ".join(
        f"'{name}', {aliased[name]}" for name in rules
    )
    return agg.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).select("rule", "n_rows", "n_violations")


def functional_dependencies(
    df: DataFrame, pairs: list[tuple[str, str]], table_name: str = ""
) -> DataFrame:
    """Profile candidate functional dependencies lhs -> rhs: does every
    distinct lhs value map to exactly one rhs value?

    One row per candidate pair: (tbl, lhs, rhs, n_groups long,
    n_violating long, holds boolean) where ``n_violating`` counts lhs
    groups with >1 distinct rhs.

    NULL semantics (documented trade, shared with the DuckDB oracle):
    ``countDistinct`` ignores NULL rhs values, so an lhs group mapping
    to {x, NULL} — or to all NULLs — counts as NON-violating; ``holds``
    asserts "at most one NON-NULL rhs per lhs", not strict textbook FD.
    Coalesce rhs to a sentinel before calling if NULL should count as
    its own value. The schema-discovery primitive behind
    key detection and denormalization checks (public technique; e.g.
    the TANE family of FD-mining algorithms works from exactly these
    per-group distinct counts).

    Scale shape: each pair costs one hash aggregate keyed by lhs (map-
    side partial distinct on (lhs, rhs)) followed by a 1-row rollup —
    linear scans, no joins, nothing driver-side. Pairs are independent
    branches unioned positionally, so Spark schedules them in parallel
    off the (cached or re-read) scan.
    """
    if not pairs:
        raise ValueError("at least one (lhs, rhs) pair required")
    branches = []
    for lhs, rhs in pairs:
        g = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("__k"))
        branches.append(
            g.agg(
                F.count("*").cast("long").alias("n_groups"),
                F.count_if(F.col("__k") > 1).cast("long").alias("n_violating"),
            ).select(
                F.lit(table_name).alias("tbl"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "n_violating",
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def quarantine(
    df: DataFrame, rules: dict[str, Column], failed_col: str = "failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (good, bad). ``bad`` carries ``failed_col``, the
    sorted array of names of the rules the row fails (fail-closed on
    NULL, matching ``expectation_metrics``). Pure map — no shuffle."""
    if not rules:
        raise ValueError("at least one rule required")
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(_violation(rule) == 1, F.lit(name))
                    for name, rule in rules.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn(failed_col, failed)
    good = tagged.filter(F.size(failed_col) == 0).drop(failed_col)
    bad = tagged.filter(F.size(failed_col) > 0)
    return good, bad


def fk_violation_count(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity rule: count child rows whose key has no
    parent (orphans). NULL child keys are orphans (fail-closed).
    Left-anti join — shuffles on the key; at scale AQE broadcasts the
    parent's deduped key column when it is small."""
    parents = parent.select(F.col(parent_key).alias("__pk")).distinct()
    orphans = child.join(
        parents, child[child_key].eqNullSafe(F.col("__pk")), "left_anti"
    )
    return orphans.agg(F.count("*").cast("long").alias("n_violations"))


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` while collecting aggregate ``metrics`` IN-FLIGHT via
    the Observation API — the counters ride the write job itself, so a
    100 TB write gets its row counts / null counts / violation tallies
    for free instead of paying a second full scan (the naive
    ``df.count(); df.write...`` pattern doubles the I/O bill).

    ``metrics`` maps name -> aggregate Column (count/sum/min/max style
    — Observation requires aggregates without grouping). Returns the
    observed values as a dict after the write completes.

    The observed node sits above the scan and below the write, so the
    metrics describe exactly the rows written — a post-hoc read-back
    could already see a concurrent writer's rows."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(
        obs, *[expr.alias(name) for name, expr in metrics.items()]
    )
    observed.write.format(fmt).mode(mode).save(path)
    return obs.get
