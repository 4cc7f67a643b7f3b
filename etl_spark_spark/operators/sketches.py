"""Count-min sketch: mergeable heavy-hitter frequency estimates.

The 100 TB problem: "how often does each of these probe terms occur,
per source, across the whole corpus?" answered from CONSTANT-size
state per group instead of a vocabulary-size aggregation. A CMS is a
depth x width grid of counters; each occurrence increments one counter
per row (hash_r(term) mod width). Point estimate = min over rows —
always an OVERestimate, off by at most eps*N with probability
1 - delta for width = ceil(e/eps), depth = ceil(ln(1/delta))
(Cormode & Muthukrishnan 2005).

Why it fits Spark: counters are SUMS, so the sketch is associative and
order-independent — partial aggregation combines map-side, sketches of
different partitions/groups/days merge by cell-wise addition, and the
result is bit-identical at any parallelism (ORACLE_NOTES rung 1: stay
integral). State per group = depth*width cells regardless of corpus
size; the estimate join touches only probed cells.

Hashing is md5-derived (rung "hashes"), so an ANSI-SQL oracle rebuilds
the identical grid cell-for-cell.

Reference scope: no sketches in the etl-spark reference (533-line
job); §7 LLM-pipeline extension alongside the HLL distinct-count
sketches in q_sketch_stats/q_sketch_rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(term: Column, row: int, width: int) -> Column:
    """Row-r bucket of a term: md5 salted by row, first 15 hex chars as
    int64, mod width."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}~"), term)), 1, 15),
        16,
        10,
    ).cast("long") % F.lit(int(width))


def cms_build(
    occurrences: DataFrame,
    term: Column | str,
    width: int,
    depth: int = 3,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sketch the stream of term occurrences (one input row = one
    occurrence): returns (group_cols..., row, bucket, cnt) with only
    touched cells materialized (untouched cells are implicitly 0 — the
    probe side coalesces). One explode (depth rows per occurrence) +
    one hash aggregate; merge sketches by re-aggregating sum(cnt)."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width and depth must be positive: {width}, {depth}")
    term = F.col(term) if isinstance(term, str) else term
    group_cols = list(group_cols or [])
    cells = occurrences.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(term, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__c"),
    )
    return cells.groupBy(
        *group_cols, F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str,
    width: int,
    depth: int = 3,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-estimate each probe term against the sketch: returns
    ``probes``' columns + ``est`` (bigint, >= true count, <= true count
    + eps*N w.p. 1-delta). ``probes`` must carry ``term_col`` and any
    ``group_cols``; the join touches depth cells per (probe, group)."""
    group_cols = list(group_cols or [])
    p = probes.select(
        *group_cols,
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(term_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(*group_cols, term_col, "__c.row", "__c.bucket")
    joined = p.join(sketch, [*group_cols, "row", "bucket"], "left")
    return joined.groupBy(*group_cols, term_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def cms_build_sql_cte(
    occurrences_select: str,
    width: int,
    depth: int = 3,
    group_cols: list[str] | None = None,
    name: str = "cms",
) -> str:
    """DuckDB CTE mirroring :func:`cms_build`. ``occurrences_select``
    must yield column ``term`` plus any group columns; emits CTE
    ``{name}(group_cols..., row, bucket, cnt)``."""
    gc = "".join(f"{c}, " for c in (group_cols or []))
    rows = " UNION ALL ".join(
        f"SELECT {gc}{r} AS row, "
        f"('0x' || substr(md5('cms{r}~' || term), 1, 15))::BIGINT "
        f"% {int(width)} AS bucket FROM occ_{name}"
        for r in range(depth)
    )
    return f"""occ_{name} AS ({occurrences_select}),
cells_{name} AS ({rows}),
{name} AS (
  SELECT {gc}row, bucket, count(*) AS cnt
  FROM cells_{name} GROUP BY ALL
)"""
