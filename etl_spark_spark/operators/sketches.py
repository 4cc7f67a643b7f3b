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
    # NOT fanned out (round-13): the depth-salted md5 explode feeds a
    # hash-aggregate reducer — round-12's fan_out here was kept on a
    # neutral same-session A/B, but the driver's cold protocol measured
    # the sketch family as a loss (hll_stream_fold 0.71, hll_source_overlap
    # 0.84, hll_distinct_tokens >=1.6x slower); exchanging raw occurrence
    # rows to parallelize a light per-row map costs more than it buys
    # (VERDICT r12 task 2).
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


# ---------------------------------------------------------------------------
# Portable HyperLogLog: cells and estimates bit-identical across engines
# ---------------------------------------------------------------------------

HLL_B = 10                   # 2^10 = 1024 buckets
HLL_M = 1 << HLL_B
HLL_W_BITS = 60 - HLL_B      # rank domain: 50-bit suffix
HLL_RANK_MAX = HLL_W_BITS + 1  # w == 0 -> rank 51
# Flajolet et al. bias constant for m >= 128, embedded as the SAME
# python-computed literal in both engines (ORACLE_NOTES rung 5)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_cells(
    occurrences: DataFrame,
    key: Column | str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL register table (group_cols..., bucket, m_rank): bucket =
    low 10 bits of the 60-bit md5 hash, m_rank = max over keys of
    (leading zeros of the 50-bit suffix + 1). Unlike the engine's
    approx_count_distinct sketch (opaque, engine-specific), every cell
    here is an exact integer any engine reproduces — so sketches can
    be stored, shipped cross-system, and MERGED (max per bucket) with
    a hash-exact oracle. Rank is a generated 50-branch comparison
    chain (no log2 — IEEE log of a power boundary is not guaranteed
    exact cross-engine)."""
    key = F.col(key) if isinstance(key, str) else key
    group_cols = list(group_cols or [])
    # NOT fanned out (round-13): same driver-measured revert as
    # cms_build above — the md5 + rank chain is ONE hash per occurrence
    # feeding a max-merge partial aggregate; the round-12 exchange of
    # raw occurrence rows regressed every hll_* query on the driver's
    # cold protocol (VERDICT r12 task 2).
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    w = F.expr(f"__h div {HLL_M}")
    rank = F.lit(HLL_RANK_MAX)
    # build WHEN chain from smallest threshold up so the final object
    # checks largest first (when() prepends)
    for r in range(HLL_W_BITS, 0, -1):
        rank = F.when(
            F.col("__w") >= F.lit(1 << (HLL_W_BITS - r)), F.lit(r)
        ).otherwise(rank)
    cells = occurrences.select(
        *group_cols, h.alias("__h")
    ).select(
        *group_cols,
        (F.col("__h") % HLL_M).alias("bucket"),
        w.alias("__w"),
    ).select(*group_cols, "bucket", rank.alias("__rank"))
    return cells.groupBy(*group_cols, "bucket").agg(
        F.max("__rank").alias("m_rank")
    )


def hll_estimate(
    cells: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate per group from an :func:`hll_cells` table:
    (group_cols..., n_buckets_used, est_milli).

    Exact-arithmetic shape (cross-engine bit-identical): the register
    sum Σ 2^-M is scaled by 2^51 into one exact int64 (absent buckets
    contribute 2^51 each; max total 2^61), the raw estimate is then
    alpha·m²·2^51 / S — a python-literal numerator (a power-of-two
    multiple of alpha, exactly representable) over one correctly
    rounded int64->double cast and one division. Linear-counting
    correction (E <= 2.5m with empty buckets) uses ln(m/V) — 1-ulp
    engine drift absorbed by the milli quantization (rung 4)."""
    group_cols = list(group_cols or [])
    agg = cells.groupBy(*group_cols).agg(
        F.count("*").alias("n_buckets_used"),
        F.sum(
            F.expr(f"shiftleft(1L, {HLL_RANK_MAX} - m_rank)")
        ).alias("__s_present"),
    )
    s = (
        F.col("__s_present")
        + (F.lit(HLL_M) - F.col("n_buckets_used"))
        * F.lit(1 << HLL_RANK_MAX).cast("long")
    )
    numer = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RANK_MAX))
    raw = numer / s.cast("double")
    v = F.lit(HLL_M) - F.col("n_buckets_used")
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(HLL_M).cast("double") / v.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0), lc
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_buckets_used",
        F.round(est * F.lit(1000.0)).cast("long").alias("est_milli"),
    )


def hll_sql_rank_case(w_expr: str) -> str:
    """The 50-branch rank CASE mirrored in SQL (largest first, same
    order as the Spark WHEN chain)."""
    branches = "\n    ".join(
        f"WHEN {w_expr} >= {1 << (HLL_W_BITS - r)} THEN {r}"
        for r in range(1, HLL_W_BITS + 1)
    )
    return f"CASE {branches}\n    ELSE {HLL_RANK_MAX} END"


def hll_sql_estimate_exprs() -> dict[str, str]:
    """SQL fragments mirroring :func:`hll_estimate`, to compose into a
    grouped SELECT over a cells CTE with columns (bucket, m_rank):
    returns {'s': ..., 'est': ...} where `s` aggregates and `est` is
    the final expression over aliases n_buckets_used / s_scaled."""
    numer = repr(HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RANK_MAX))
    return {
        "s": (
            f"sum(1::BIGINT << ({HLL_RANK_MAX} - m_rank)) "
            f"+ ({HLL_M} - count(*)) * {1 << HLL_RANK_MAX}::BIGINT"
        ),
        "est": (
            f"CASE WHEN {numer} / CAST(s_scaled AS DOUBLE) <= {2.5 * HLL_M!r} "
            f"AND ({HLL_M} - n_buckets_used) > 0 "
            f"THEN {float(HLL_M)!r} * ln(CAST({HLL_M} AS DOUBLE) "
            f"/ CAST({HLL_M} - n_buckets_used AS DOUBLE)) "
            f"ELSE {numer} / CAST(s_scaled AS DOUBLE) END"
        ),
    }


# ---------------------------------------------------------------------------
# Portable quantile sketch: deterministic Bernoulli sample distribution
# ---------------------------------------------------------------------------


def quantile_sketch_build(
    df: DataFrame,
    row_key: Column | str,
    value_col: str,
    group_cols: list[str] | None = None,
    sample_mod: int = 16,
) -> DataFrame:
    """The quantile leg of the portable-sketch family (HLL = distinct
    counts, CMS = term counts, this = order statistics): a
    DETERMINISTIC 1/``sample_mod`` Bernoulli row sample, aggregated to
    the per-(group, value) distribution — (group_cols..., value, cnt).

    Why this shape at 100 TB: exact quantiles need the full
    distinct-value distribution; Spark's approx_percentile sketch is
    exact-bounded but OPAQUE and engine-specific — it cannot be
    stored, shipped to another system, or re-queried at a different q
    without the raw data. This sketch's state is plain rows any
    engine reproduces bit-for-bit: membership is md5-derived from
    ``row_key`` (the 'qsk~' salt, same 15-hex-digit construction as
    the CMS/HLL hashes — ORACLE_NOTES rung 'hashes'), so the SAME
    rows are sampled in Spark and in the SQL oracle, and sketches of
    DISJOINT shards merge by unioning and re-summing ``cnt`` (the
    CMS merge law; not idempotent — shards must partition the data,
    the standard partial-aggregate contract).

    Accuracy (classic Bernoulli-sample bound, DKW): with k sampled
    rows, any sample q-quantile is within rank error
    O(sqrt(ln(1/delta)/k)) of the population q-quantile w.p.
    1-delta — ~1% at k=10k. q:price_quartile_sketch_eval MEASURES the
    realized rank error against the exact quartiles rather than
    trusting the bound (the repo's measure-don't-guess discipline).

    ``row_key`` must uniquely identify a row (so membership is a
    property of the ROW, giving determinism under retries/shuffles
    and shard-invariant merges); NULL values follow the
    cumulative-distribution family discipline (loud raise — see
    stats._checked_measure).
    """
    from .stats import _checked_measure

    if sample_mod <= 0:
        raise ValueError(f"sample_mod must be positive, got {sample_mod}")
    key = F.col(row_key) if isinstance(row_key, str) else row_key
    group_cols = list(group_cols or [])
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("qsk~"), key)), 1, 15), 16, 10
    ).cast("long")
    # NOT fanned out (round-13): one membership md5 + filter per row
    # feeding the distribution hash-aggregate — the same efficient-
    # partial-agg shape as exact_group_quantiles, where round-12
    # measured a raw-row fan-out exchange at 1.5x WORSE; round-12's own
    # A/B here read 1.04x (a slight loss it kept for symmetry), and the
    # driver protocol scored the sketch-family fan_outs net negative
    # (VERDICT r12 task 2).
    return (
        df.filter(h % F.lit(int(sample_mod)) == 0)
        .select(
            *group_cols,
            _checked_measure(
                F.col(value_col), "quantile_sketch_build", value_col
            ).alias(value_col),
        )
        .groupBy(*group_cols, value_col)
        .agg(F.count("*").alias("cnt"))
    )


def quantile_sketch_merge(
    sketches: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge unioned sketch rows from DISJOINT shards: cell-wise sum,
    same law as CMS. (Union the shard DataFrames first; this
    re-aggregates.)"""
    group_cols = list(group_cols or [])
    return sketches.groupBy(*group_cols, value_col).agg(
        F.sum("cnt").alias("cnt")
    )


def quantile_sketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Estimate population quantiles from the sketch: the sample
    discrete quantile, via the exact weighted-quantile machinery with
    ``cnt`` as the weight (stats.exact_weighted_quantiles — smallest v
    with cum-cnt >= ceil(q * k)). Returns (group_cols...,
    total_weight=k sampled rows, wq25, wq50, ...)."""
    from .stats import exact_weighted_quantiles

    return exact_weighted_quantiles(
        sketch, group_cols, value_col, "cnt", qs=qs
    )


def quantile_sketch_sql_cte(
    source_select: str,
    row_key_expr: str,
    value_expr: str,
    group_cols: list[str] | None = None,
    sample_mod: int = 16,
    name: str = "qsk",
) -> str:
    """DuckDB CTE mirroring :func:`quantile_sketch_build` cell-for-cell
    (identical md5 membership, identical loud NULL guard). Emits CTE
    ``{name}(group_cols..., v, cnt)``."""
    from .stats import checked_measure_sql

    gc = "".join(f"{c}, " for c in (group_cols or []))
    guard = checked_measure_sql(
        value_expr, "quantile_sketch_build", value_expr
    )
    return f"""src_{name} AS ({source_select}),
{name} AS (
  SELECT {gc}{guard} AS v, count(*) AS cnt
  FROM src_{name}
  WHERE ('0x' || substr(md5('qsk~' || ({row_key_expr})), 1, 15))::BIGINT
        % {int(sample_mod)} = 0
  GROUP BY ALL
)"""
