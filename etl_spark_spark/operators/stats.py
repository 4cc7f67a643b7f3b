"""Exact distributed statistics: order statistics and distribution
tests computed from DISTRIBUTION AGGREGATES, never a global sort.

The shared trick: pre-aggregate to one row per distinct (group, value)
— at scale this is the decisive shrink (a 100 TB fact has far fewer
distinct cents values than rows) — then run windows over the compact
distribution. Cumulative counts are integer sums (associative,
bit-stable under any shuffle order), and every derived ratio is an
exact-integer IEEE division an oracle can mirror.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _q_labels(prefix: str, qs: Sequence[float]) -> list[str]:
    """Output-column labels for quantile requests. Whole-percent qs
    keep the historical compact form (0.25 -> 'q25'); anything finer
    derives the label from the FULL q value (0.125 -> 'q0_125') —
    int(q*100) alone would collide 0.125 with 0.12 and 0.999 with
    0.99, failing later at analysis time with an unrelated-looking
    duplicate-column error. Duplicate requests are rejected here,
    where the message can say why."""
    labels = []
    for q in qs:
        pct = q * 100
        # tolerance, not ==: 0.07 * 100 is 7.000000000000001 in binary
        # floats — exact comparison would mislabel whole percents
        if abs(pct - round(pct)) < 1e-9:
            labels.append(f"{prefix}{int(round(pct))}")
        else:
            labels.append(f"{prefix}{q}".replace(".", "_"))
    dupes = {x for x in labels if labels.count(x) > 1}
    if dupes:
        raise ValueError(f"duplicate quantile labels from qs={qs}: {dupes}")
    return labels


def _checked_measure(c: Column, op: str, name: str) -> Column:
    """Loud NULL guard for a measure entering cumulative-distribution
    machinery (quantiles, CDFs, ranks, bin edges): Spark windows order
    NULLS FIRST while ANSI engines (the DuckDB oracles) default to
    NULLS LAST, so a NULL measure silently shifts every cumulative
    threshold engine-dependently — the same divergence class as the
    theil_sen NULL-x/y guard (ADVICE r11), verified live on
    [(g,NULL),(g,1),(g,2),(g,3)]: q50 = 1 in Spark vs 2 in DuckDB.
    The ``otherwise`` branch carries the raise so the WHEN branch pins
    the result type to the measure's own type (no cast needed)."""
    return F.when(c.isNotNull(), c).otherwise(
        F.raise_error(
            F.lit(
                f"{op}: NULL {name} — filter or impute NULL "
                "measurements upstream (NULL orders engine-"
                "dependently: Spark windows put NULLS FIRST, ANSI "
                "engines typically LAST, silently shifting every "
                "cumulative threshold)"
            )
        )
    )


def checked_measure_sql(expr: str, op: str, name: str) -> str:
    """The identical guard for the DuckDB oracle mirrors: wrap the
    measure expression in the dist CTE so both engines raise on the
    same inputs (loud-guard discipline: ENFORCED in both engines, like
    max_series/max_points)."""
    msg = (
        f"{op}: NULL {name} — filter or impute NULL measurements "
        "upstream (NULL orders engine-dependently: Spark windows put "
        "NULLS FIRST, ANSI engines typically LAST, silently shifting "
        "every cumulative threshold)"
    )
    return f"CASE WHEN ({expr}) IS NULL THEN error('{msg}') ELSE {expr} END"


def exact_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """EXACT discrete quantiles per group: for each q, the smallest
    value v with count(x <= v) >= ceil(q * n). No approximation (the
    scale alternative Spark offers, approx_percentile, has an error
    bound) and no global sort: one hash aggregate to the per-(group,
    value) distribution, one window partitioned by group over that
    compact distribution, one final aggregate.

    ``qs`` entries should be exactly-representable binary fractions
    (0.25, 0.5, 0.75...) so ceil(q*n) never suffers float jitter; the
    semantics above are pinned in plain SQL by the oracle, not by any
    engine's quantile builtin. A NULL value raises LOUDLY in both
    engines (:func:`_checked_measure`).
    """
    keys = list(group_cols)
    # NOT fanned out (round-12 A/B): the map-side partial aggregate is
    # itself the reducer here — round-robin exchanging the raw fact
    # rows to parallelize it cost 1.5x more than it won back
    # (price_outliers off 4.31 s / on 6.52 s, same session)
    dist = df.select(
        *keys,
        _checked_measure(
            F.col(value_col), "exact_group_quantiles", value_col
        ).alias(value_col),
    ).groupBy(*keys, value_col).agg(F.count("*").alias("__c"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*keys)
    cum = dist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wg)
    )
    aggs = []
    for q, label in zip(qs, _q_labels("q", qs)):
        target = F.ceil(F.lit(q) * F.col("__n"))
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= target, F.col(value_col))
            ).alias(label)
        )
    return cum.groupBy(*keys).agg(
        F.max("__n").alias("n"),
        *aggs,
    )


def scalable_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bucket_of: Column,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    weight_col: str | None = None,
) -> DataFrame:
    """:func:`exact_group_quantiles` without the per-group single-task
    window — identical values, decomposed cumulative counts.

    The plain form's scale ceiling: its window partitions by GROUP, so
    one task materializes a group's entire distinct-value distribution
    (millions of distinct prices under 3 return flags at the 100 TB
    design point — the same single-task class as theil_sen's pair
    generation). This form applies the prefix-sum decomposition of
    ``scalable_running_sum`` PER GROUP:

    1. hash-aggregate to the per-(group, value) distribution (same
       decisive shrink as the plain form);
    2. within-(group, bucket) cumulative counts — parallel windows;
    3. per-(group, bucket) totals, offset by an exclusive prefix over
       the bucket-totals table (the only serial-per-group window,
       sized by the BUCKET count, not the distinct-value count);
    4. global cum = within + offset, then the identical
       smallest-v-with-cum>=ceil(q*n) selection.

    ``bucket_of`` is an expression over ``value_col`` that must be a
    monotone NONDECREASING, non-NULL coarsening of the value (e.g.
    ``F.floor(F.col("price") / 100)``) — monotonicity is ENFORCED
    (adjacent buckets whose value ranges overlap raise loudly, the
    scalable_running_sum guard) and NULL buckets raise before the
    decomposition. Values are guarded non-NULL exactly like the plain
    form, and NULL group keys remain a real group (null-safe join).

    The oracle story is the point: results are bit-identical to
    exact_group_quantiles for ANY valid bucketing, so the same
    plain-window SQL oracle pins both forms (q:price_quartiles_scalable
    shares q:exact_price_quartiles' oracle verbatim).

    ``weight_col`` switches to the :func:`exact_weighted_quantiles`
    semantics (integer weights summed into the distribution; targets
    ceil(q*W); output columns total_weight/wq25/... for drop-in oracle
    compatibility) — the weighted form has the identical per-group
    single-task window ceiling, decomposed the identical way.
    """
    from .windows import _checked_offset

    keys = list(group_cols)
    op = "scalable_group_quantiles"
    # NOT fanned out — same A/B verdict as exact_group_quantiles
    if weight_col is None:
        dist = df.select(
            *keys,
            _checked_measure(F.col(value_col), op, value_col).alias(
                value_col
            ),
        ).groupBy(*keys, value_col).agg(F.count("*").alias("__c"))
    else:
        dist = df.select(
            *keys,
            _checked_measure(F.col(value_col), op, value_col).alias(
                value_col
            ),
            _checked_measure(F.col(weight_col), op, weight_col).alias(
                weight_col
            ),
        ).groupBy(*keys, value_col).agg(
            F.sum(F.col(weight_col).cast("long")).alias("__c")
        )
    bkt = F.when(bucket_of.isNotNull(), bucket_of).otherwise(
        F.raise_error(
            F.lit(
                f"{op}: bucket_of produced NULL for a non-NULL value — "
                "the bucket expression must be a total, non-NULL "
                "coarsening of the value"
            )
        )
    )
    tagged = dist.withColumn("__bkt", bkt)
    w_in = (
        Window.partitionBy(*keys, "__bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged.withColumn("__within", F.sum("__c").over(w_in))
    # totals stays a plain hash aggregate over `tagged` — round-13
    # MEASURED the tempting "share the window's exchange" rewrite
    # (totals = within.groupBy(...).agg(max(__within), ...)) and it is
    # a trap: exchange REUSE only dedups the shuffle, not the Sort +
    # Window above it, so the totals branch re-ran the full
    # sort-and-scan of the distribution — ruinous when the
    # distribution is large (nation_theil_sen_blocked, whose dist is
    # the O(n²) slope table, went 2.2 s -> 5.0 s). The partial
    # aggregate below shuffles only per-(group, bucket)-per-map rows,
    # so its "extra" exchange is near-free at any scale.
    totals = tagged.groupBy(*keys, "__bkt").agg(
        F.sum("__c").alias("__t"),
        F.min(value_col).alias("__om"),
        F.max(value_col).alias("__ox"),
    )
    w_b = (
        Window.partitionBy(*keys)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lag = Window.partitionBy(*keys).orderBy("__bkt")
    wg = Window.partitionBy(*keys)
    offsets = totals.select(
        *keys,
        "__bkt",
        F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__off"),
        F.lag("__ox").over(w_lag).alias("__pox"),
        "__om",
        F.sum("__t").over(wg).alias("__n"),
    ).select(
        *keys,
        "__bkt",
        _checked_offset(F.col("__off"), op).alias("__off"),
        "__n",
    )
    # broadcast the offsets spine: it is the per-(group, bucket) table
    # — the same bounded-cardinality table scalable_running_sum already
    # broadcasts (windows.py) — so the distribution-sized `within` side
    # joins WITHOUT leaving its window partitioning (no exchange of the
    # big side; round-13, guide §3.1)
    lhs, rhs = within.alias("__sgl"), F.broadcast(offsets.alias("__sgr"))
    cond = F.col("__sgl.__bkt").eqNullSafe(F.col("__sgr.__bkt"))
    for k in keys:
        cond = cond & F.col(f"__sgl.{k}").eqNullSafe(F.col(f"__sgr.{k}"))
    cum = lhs.join(rhs, cond).select(
        *[F.col(f"__sgl.{k}") for k in keys],
        F.col(f"__sgl.{value_col}").alias(value_col),
        (F.col("__sgl.__within") + F.col("__sgr.__off")).alias("__cum"),
        F.col("__sgr.__n").alias("__n"),
    )
    aggs = []
    prefix = "q" if weight_col is None else "wq"
    for q, label in zip(qs, _q_labels(prefix, qs)):
        target = F.ceil(F.lit(q) * F.col("__n"))
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= target, F.col(value_col))
            ).alias(label)
        )
    n_alias = "n" if weight_col is None else "total_weight"
    return cum.groupBy(*keys).agg(F.max("__n").alias(n_alias), *aggs)


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    variant_col: str,
    variant_a: str = "A",
    bucket: Column | None = None,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov D statistic:
    D = max over observed values of |F_a(v) - F_b(v)|, with the
    empirical CDFs evaluated at every distinct value (right-continuous,
    the textbook definition — ties handled exactly).

    Scale path: per-distinct-value counts for each sample, then the
    cumulative counts via the distributed prefix-sum decomposition
    (``bucket`` must be monotone in the value order; defaults to the
    value itself, right for discrete/fixed-point measures) — never a
    single-task global window. A NULL value raises LOUDLY in both
    engines (:func:`_checked_measure`). Returns one row:
    (n_a, n_b, d_stat)."""
    from .windows import scalable_running_sum

    is_a = F.col(variant_col) == F.lit(variant_a)
    dist = (
        df.select(
            variant_col,
            _checked_measure(
                F.col(value_col), "ks_two_sample", value_col
            ).alias(value_col),
        )
        .groupBy(value_col)
        .agg(
            F.count(F.when(is_a, 1)).alias("__ca"),
            F.count(F.when(~is_a, 1)).alias("__cb"),
        )
    )
    b = bucket if bucket is not None else F.col(value_col)
    cum_a = scalable_running_sum(
        dist, b, [value_col], "__ca", out_col="__cuma"
    )
    cum = scalable_running_sum(
        cum_a, b, [value_col], "__cb", out_col="__cumb"
    )
    totals = dist.agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    d = F.abs(
        F.col("__cuma").cast("double") / F.col("n_a").cast("double")
        - F.col("__cumb").cast("double") / F.col("n_b").cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select("n_a", "n_b", d.alias("__d"))
        .groupBy("n_a", "n_b")
        .agg(F.max("__d").alias("d_stat"))
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    variant_col: str,
    variant_a: str = "A",
) -> DataFrame:
    """EXACT Mann-Whitney U (Wilcoxon rank-sum) with tie correction.

    The nonparametric two-sample location test — the robust companion
    to the Welch t (``ab_test_welch``) and KS (``ks_two_sample``)
    shapes: compares A/B by ranks, so it needs no normality and shrugs
    off outliers.

    Scale path (same trick as the siblings): collapse to ONE row per
    distinct value with per-variant counts, then ranks come from an
    integer prefix sum over that compact distribution — never a
    per-row global sort. All sufficient statistics are integers
    (doubled average ranks are integral even at ties), so every
    derived double — U, the tie-corrected normal approximation z —
    is a deterministic IEEE expression over exact integers that an
    ANSI-SQL oracle reproduces bitwise (sqrt is correctly rounded per
    IEEE 754, unlike ln/exp).

    Returns one row: (n_a, n_b, u_a, tie_term, z) where u_a is the
    U statistic of variant A and z uses the tie-corrected variance
    sigma^2 = (na*nb/12)*((n+1) - T/(n*(n-1))), T = sum(t^3 - t).

    Integer-range bound (documented, audited green at the 100x
    replica): the long sufficient statistics are exact up to
    ~2e9 rows per test (2*Ra ~ 2n^2 < 2^63) and tie groups up to
    ~2e6 members (t^3 < 2^63). Beyond that, route the three sums
    through decimal(38,0) and emit tie_term as decimal — the z
    formula itself is unchanged.

    A NULL value raises LOUDLY in both engines
    (:func:`_checked_measure`): ranks come from a cumulative count
    ordered by value, where NULL placement is engine-dependent.
    """
    is_a = F.col(variant_col) == F.lit(variant_a)
    df = df.select(
        variant_col,
        _checked_measure(
            F.col(value_col), "mann_whitney_u", value_col
        ).alias(value_col),
    )
    dist = df.groupBy(value_col).agg(
        F.count(F.when(is_a, 1)).alias("__ca"),
        F.count(F.when(~is_a, 1)).alias("__cb"),
    )
    from .windows import scalable_running_sum

    dist = dist.withColumn("__nv", F.col("__ca") + F.col("__cb"))
    cum = scalable_running_sum(
        dist, F.col(value_col), [value_col], "__nv", out_col="__cum"
    )
    # doubled average rank of the tie group at v: 2*cum_before + nv + 1
    rank2 = 2 * (F.col("__cum") - F.col("__nv")) + F.col("__nv") + 1
    agg = cum.agg(
        F.sum("__ca").alias("n_a"),
        F.sum("__cb").alias("n_b"),
        F.sum(F.col("__ca") * rank2).alias("__ra2"),
        F.sum(
            F.col("__nv").cast("long") * F.col("__nv") * F.col("__nv")
            - F.col("__nv")
        ).alias("tie_term"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = F.col("n_a") + F.col("n_b")
    # U2 = 2*Ra - na*(na+1)  (exact integers)
    u2 = F.col("__ra2") - F.col("n_a") * (F.col("n_a") + 1)
    s2 = (
        na * nb / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_term").cast("double")
            / (n.cast("long") * (n - 1)).cast("double")
        )
    )
    z = (u2.cast("double") - na * nb) / (2.0 * F.sqrt(s2))
    return agg.select(
        "n_a",
        "n_b",
        (u2.cast("double") / 2.0).alias("u_a"),
        "tie_term",
        z.alias("z"),
    )


def exact_weighted_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """EXACT weighted quantiles per group: the smallest value v with
    weight(x <= v) >= ceil(q * W), W = total integer weight — the
    volume-weighted median/quartiles shape ("half the QUANTITY moved at
    or below this price"), which the unweighted form can't answer.

    Same scale path as :func:`exact_group_quantiles`: collapse to the
    per-(group, value) distribution summing INTEGER weights, one
    window over the compact distribution, one final aggregate.
    ``weight_col`` must be integral (cast upstream) so cumulative
    weights are exact under any shuffle order. A NULL value OR weight
    raises LOUDLY in both engines: NULL values order engine-
    dependently (:func:`_checked_measure`); a NULL weight would be
    silently dropped by SUM — "this row weighs nothing" is a data bug
    the caller must resolve, not a default.
    """
    keys = list(group_cols)
    # NOT fanned out — same A/B verdict as exact_group_quantiles
    dist = df.select(
        *keys,
        _checked_measure(
            F.col(value_col), "exact_weighted_quantiles", value_col
        ).alias(value_col),
        _checked_measure(
            F.col(weight_col), "exact_weighted_quantiles", weight_col
        ).alias(weight_col),
    ).groupBy(*keys, value_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*keys)
    cum = dist.withColumn("__cum", F.sum("__w").over(w)).withColumn(
        "__tw", F.sum("__w").over(wg)
    )
    aggs = []
    for q, label in zip(qs, _q_labels("wq", qs)):
        target = F.ceil(F.lit(q) * F.col("__tw"))
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= target, F.col(value_col))
            ).alias(label)
        )
    return cum.groupBy(*keys).agg(F.max("__tw").alias("total_weight"), *aggs)


#: Lehmer/MINSTD modulus and multiplier: M = 2^31 - 1 (prime),
#: A = 48271. Chosen because every operation stays below 2^62, so the
#: EXACT same signed-64-bit arithmetic runs on the JVM and in any SQL
#: engine with BIGINT — no wraparound semantics to reconcile.
LEHMER_M = 2147483647
LEHMER_A = 48271

#: Poisson(1) CDF thresholds scaled so that for u uniform on
#: [1, M-1], P(u < t_k) = CDF(k) (t_k = 1 + round(cdf_k * (M-1))) —
#: computed once in Python and embedded as the SAME literals in the
#: Spark expression and the SQL oracle, so the weight drawn from a
#: Lehmer uniform is engine-identical by construction.
#: P(w > 8) ~ 1.1e-6 -> clamped to 9.
POISSON1_THRESHOLDS = (
    790015085,
    1580030168,
    1975037710,
    2106706891,
    2139624186,
    2146207645,
    2147304888,
    2147461637,
    2147481231,
)


def lehmer_multipliers(b: int) -> list[int]:
    """A^(r+1) mod M for r = 0..b-1 — the per-replicate multipliers
    that turn one md5-derived seed per row into b decorrelated
    uniforms (u_r = seed * A^(r+1) mod M is the MINSTD stream from
    ``seed``, evaluated in closed form so each exploded row does one
    multiply + one mod instead of iterating)."""
    return [pow(LEHMER_A, r + 1, LEHMER_M) for r in range(b)]


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b: int = 100,
    lo_rank: int = 3,
    hi_rank: int = 98,
) -> DataFrame:
    """Distributed bootstrap confidence interval for the mean, the
    single-pass Poisson-bootstrap way (resampling WITH replacement is
    a shuffle-killer at scale; giving every row an independent
    Poisson(1) weight per replicate is free and converges to the same
    distribution — the standard large-scale trick).

    DETERMINISTIC: ONE md5 digest per row seeds a Lehmer/MINSTD
    stream whose r-th uniform is computed in closed form
    (u_r = seed * A^(r+1) mod M, multipliers precomputed as literals),
    and the Poisson(1) CDF is inverted against integer literal
    thresholds — reproducible across runs, partitionings, and
    engines, and every op is exact signed-64-bit integer arithmetic
    both engines share. The digest work dominated earlier versions
    (b/4 digests per row at 14.6 s warm / sf0.1); one digest plus b
    multiply-mods runs the same query in ~a third of that.

    Scale shape: one ``b``-fold map-side fanout (one explode of a
    constant array), one hash aggregate to ``b`` replicate rows, order
    statistics over those ``b`` rows. Values must be integral (cents);
    replicate means are exact-integer divisions. Returns one row:
    (n, b_replicates, mean_value, ci_lo, ci_hi) where ci bounds are
    the ``lo_rank``-th / ``hi_rank``-th smallest replicate means
    (rank ties broken by replicate id).
    """
    if not (1 <= lo_rank < hi_rank <= b):
        raise ValueError(
            f"need 1 <= lo_rank < hi_rank <= b, got "
            f"lo_rank={lo_rank}, hi_rank={hi_rank}, b={b}"
        )
    key = F.col(key_col)
    # seed in [1, M-1] from the top 60 bits of one digest (15 hex
    # chars keep conv() inside signed-long range)
    h = F.md5(key.cast("string"))
    seed = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
        % F.lit(LEHMER_M - 1)
        + F.lit(1)
    )
    seeded = df.select(
        F.col(value_col).cast("long").alias("__v"), seed.alias("__s")
    )
    pairs = F.array(
        *[
            F.struct(F.lit(r).alias("r"), F.lit(m).alias("m"))
            for r, m in enumerate(lehmer_multipliers(b))
        ]
    )
    reps = seeded.select(
        "__v", "__s", F.explode(pairs).alias("__p")
    ).select(
        "__v",
        F.col("__p.r").alias("__r"),
        ((F.col("__s") * F.col("__p.m")) % F.lit(LEHMER_M)).alias("__u"),
    )
    u = F.col("__u")
    w = F.lit(len(POISSON1_THRESHOLDS))
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_THRESHOLDS[k]), F.lit(k)).otherwise(w)
    per_rep = (
        reps.withColumn("__w", w.cast("long"))
        .groupBy("__r")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__swv"),
            F.sum("__w").alias("__sw"),
        )
        .select(
            "__r",
            (F.col("__swv").cast("double") / F.col("__sw").cast("double")
             ).alias("__mean"),
        )
    )
    wnd = Window.orderBy("__mean", "__r")
    ranked = per_rep.withColumn("__rn", F.row_number().over(wnd))
    ci = ranked.agg(
        F.min(F.when(F.col("__rn") == lo_rank, F.col("__mean"))).alias(
            "ci_lo"
        ),
        F.min(F.when(F.col("__rn") == hi_rank, F.col("__mean"))).alias(
            "ci_hi"
        ),
    )
    totals = df.agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col(value_col).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_value"),
    )
    return totals.crossJoin(F.broadcast(ci)).select(
        "n", F.lit(b).alias("b_replicates"), "mean_value", "ci_lo", "ci_hi"
    )


def embedding_covariance(
    emb: DataFrame, vec_col: str, scale: int = 10**6
) -> DataFrame:
    """Exact distributed covariance matrix of an embedding column —
    the sufficient-statistics pass before whitening / PCA / OPQ
    rotation training (the IVF-PQ index in operators.similarity
    consumes exactly this kind of second-moment estimate).

    Determinism is the whole design: each component is quantized to
    fixed point ONCE (``round(x·scale)`` — micro units by default),
    then every sum is integer-exact (decimal(38,0)), so the statistics
    are bit-identical under any partitioning, and the single final
    division per cell is one IEEE op both engines perform on identical
    exact inputs. A float-sum covariance would be accumulation-order-
    dependent — unhashable cross-engine.

    Output: one row per UPPER-TRIANGLE cell (dim_i <= dim_j):
    (dim_i, dim_j, n, cov_q2) where cov_q2 is the covariance of the
    QUANTIZED components: cov_q2 = (n·Σqiqj − Σqi·Σqj) / n² — divide
    by scale² for raw units.

    Scale shape: the d(d+1)/2 cell products are generated MAP-SIDE
    from each row's array (nested transform over a slice — no self
    join, no shuffle of row-level data) and combine into the
    d(d+1)/2-row partial aggregate before any exchange, so the only
    shuffled data is (cells × partitions) tiny rows. Bounds: |q| ≤
    10^6ish ⇒ Σqiqj ≤ n·10^12 and n·Σqiqj ≤ n²·10^12 — exact in
    decimal(38,0) past 10^12 rows. The map-side blowup is n·d²/2
    narrow structs streamed straight into the hash agg — honest for
    d ≤ a few hundred; for BERT-scale d use a mapInPandas partial
    per partition (same output contract).
    """
    from .skew import fan_out

    # the d²/2 struct explode multiplies each row ~2000x map-side; on a
    # low-parallelism scan (single-row-group file = ONE task) that pins
    # one core for the whole pass (measured 9.1 s -> 1.0 s at sf0.1).
    # fan_out is a no-op when the scan already has >= cores splits, and
    # the aggregate is integer-exact so partitioning cannot move the
    # result (the operator's documented determinism contract).
    emb = fan_out(emb)
    d = F.size(F.col(vec_col))
    qarr = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
    )
    # (i, j, qi*qj) for j >= i, built map-side from the array itself
    pairs = F.flatten(
        F.transform(
            qarr,
            lambda qi, i: F.transform(
                F.slice(qarr, i + 1, d - i),
                lambda qj, k: F.struct(
                    i.alias("dim_i"),
                    (i + k).alias("dim_j"),
                    (qi * qj).cast("decimal(38,0)").alias("p"),
                ),
            ),
        )
    )
    cells = (
        emb.select(F.explode(pairs).alias("c"))
        .select("c.dim_i", "c.dim_j", "c.p")
        .groupBy("dim_i", "dim_j")
        .agg(F.sum("p").alias("__spp"), F.count("*").alias("__n"))
    )
    sums = (
        emb.select(F.posexplode(qarr).alias("dim", "q"))
        .groupBy("dim")
        .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("__s"))
    )
    si = sums.select(F.col("dim").alias("dim_i"), F.col("__s").alias("__si"))
    sj = sums.select(F.col("dim").alias("dim_j"), F.col("__s").alias("__sj"))
    num = (
        F.col("__n").cast("decimal(38,0)") * F.col("__spp")
        - F.col("__si") * F.col("__sj")
    )
    return (
        cells.join(F.broadcast(si), "dim_i")
        .join(F.broadcast(sj), "dim_j")
        .select(
            "dim_i",
            "dim_j",
            F.col("__n").cast("long").alias("n"),
            (
                num.cast("double")
                / (
                    F.col("__n").cast("decimal(38,0)")
                    * F.col("__n").cast("decimal(38,0)")
                ).cast("double")
            ).alias("cov_q2"),
        )
    )


def embedding_covariance_sql(
    table: str, vec_col: str, scale: int = 10**6
) -> str:
    """DuckDB mirror of :func:`embedding_covariance` — same
    quantization, HUGEINT-exact sums, and the identical single final
    division (VARCHAR route = correctly-rounded HUGEINT→DOUBLE)."""
    return f"""
WITH q AS (
  SELECT list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {scale})
                                  AS BIGINT)) AS qa
  FROM {table}
), cell AS (
  SELECT i.i AS dim_i, j.j AS dim_j,
         sum(CAST(qa[i.i + 1] AS HUGEINT) * qa[j.j + 1]) AS spp,
         count(*) AS n
  FROM q,
       unnest(range(len(qa))) AS i(i),
       unnest(range(len(qa))) AS j(j)
  WHERE j.j >= i.i
  GROUP BY 1, 2
), s AS (
  SELECT dim, sum(CAST(qv AS HUGEINT)) AS sv
  FROM (
    SELECT unnest(range(len(qa))) AS dim, unnest(qa) AS qv FROM q
  ) GROUP BY 1
)
SELECT c.dim_i, c.dim_j, CAST(c.n AS BIGINT) AS n,
       CAST(CAST(c.n * c.spp - si.sv * sj.sv AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(c.n AS HUGEINT) * c.n AS VARCHAR) AS DOUBLE)
           AS cov_q2
FROM cell c
JOIN s si ON si.dim = c.dim_i
JOIN s sj ON sj.dim = c.dim_j
"""


def embedding_covariance_blocked(
    emb: DataFrame, vec_col: str, scale: int = 10**6
) -> DataFrame:
    """Arrow-blocked scale path of :func:`embedding_covariance` for
    LARGE d — same output contract, same exact fixed-point statistics,
    but the d(d+1)/2 cell products come from one int64 matrix product
    per Arrow batch (numpy, O(rows·d²) flops) instead of exploding
    n·d²/2 struct rows through the row pipeline. At transformer-scale
    d (768+) the explode path materializes ~300k structs per row;
    here a 10k-row batch does one (d,b)x(b,d) integer matmul and emits
    d(d+1)/2 partial rows.

    Bit-parity design: the QUANTIZATION stays a Spark expression
    (identical F.round semantics to the exact operator and the SQL
    oracle — Python-side rounding would re-open the half-even vs
    half-up gap); numpy touches only exact int64 values. Per-batch
    partials are bounded |spp| ≤ batch_rows·(scale·max|x|)² — with the
    default ≤10k-row Arrow batches and |x| ≤ ~2 that is ≤ ~4e16, well
    inside int64; cross-batch accumulation happens in decimal(38,0)
    on the Spark side, so the global sums carry the same ≥10^12-row
    exactness bound as the exact operator. Oracle: identical to
    :func:`embedding_covariance_sql` (pinned equal by test and by the
    registry gate).
    """
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    qdf = emb.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("qa")
    )

    def _partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            arr = np.stack(pdf["qa"].to_numpy())  # (b, d) int64
            # int64-overflow guard (ADVICE r6): a cell partial is
            # bounded by rows * max|q|^2; past ~2^62 the matmul would
            # wrap SILENTLY and break the bit-parity guarantee. For
            # non-normalized corpora fall back to object-dtype
            # (arbitrary-precision) accumulation — slower, still exact.
            peak = float(np.abs(arr).max())
            if peak * peak * len(arr) < float(2**62):
                g = arr.T.astype(np.int64) @ arr.astype(np.int64)
            else:
                g = (arr.T.astype(object) @ arr.astype(object))
                if np.abs(g).max() >= 2**63:
                    raise ValueError(
                        "embedding_covariance_blocked: quantized cell "
                        f"partial exceeds int64 (max|q|={peak:.3g}, "
                        f"rows={len(arr)}); lower `scale` so "
                        "scale*max|x| fits the documented bound"
                    )
                g = g.astype(np.int64)
            iu = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "dim_i": iu[0].astype("int32"),
                    "dim_j": iu[1].astype("int32"),
                    "spp": g[iu],
                    "bn": np.full(len(iu[0]), len(arr), dtype="int64"),
                }
            )

    cells = (
        qdf.mapInPandas(
            _partials, "dim_i int, dim_j int, spp long, bn long"
        )
        .groupBy("dim_i", "dim_j")
        .agg(
            F.sum(F.col("spp").cast("decimal(38,0)")).alias("__spp"),
            F.sum("bn").alias("__n"),
        )
    )
    sums = (
        qdf.select(F.posexplode("qa").alias("dim", "q"))
        .groupBy("dim")
        .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("__s"))
    )
    si = sums.select(F.col("dim").alias("dim_i"), F.col("__s").alias("__si"))
    sj = sums.select(F.col("dim").alias("dim_j"), F.col("__s").alias("__sj"))
    num = (
        F.col("__n").cast("decimal(38,0)") * F.col("__spp")
        - F.col("__si") * F.col("__sj")
    )
    return (
        cells.join(F.broadcast(si), "dim_i")
        .join(F.broadcast(sj), "dim_j")
        .select(
            "dim_i",
            "dim_j",
            F.col("__n").cast("long").alias("n"),
            (
                num.cast("double")
                / (
                    F.col("__n").cast("decimal(38,0)")
                    * F.col("__n").cast("decimal(38,0)")
                ).cast("double")
            ).alias("cov_q2"),
        )
    )


def ks_drift_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    variant_col: str,
    variant_a: str = "A",
    bucket_of: Column | None = None,
) -> DataFrame:
    """Per-GROUP exact two-sample KS D — the segmented
    distribution-drift monitor (one D statistic per segment between
    two populations of ``variant_col``): the pass an ingestion
    pipeline runs per source/type/day to catch a feed whose value
    distribution silently shifted, where a global KS
    (:func:`ks_two_sample`) would dilute a one-segment drift into
    noise.

    Scale shape: the per-group CDFs come from windows PARTITIONED BY
    the group — parallel across groups, each partition holding only
    its group's compact one-row-per-distinct-value distribution. That
    still puts ONE group's whole distribution on one task; when a
    group's distinct-value count is itself cluster-scale (millions of
    distinct cents under a handful of event types at 100 TB), pass
    ``bucket_of`` — a monotone, non-NULL coarsening of the value
    (e.g. ``F.expr("cents div 1000")``) — and both cumulative counts
    decompose exactly like :func:`scalable_group_quantiles`
    (within-bucket windows in parallel; the serial-per-group window
    sees bucket totals only; monotonicity ENFORCED). Results are
    bit-identical for any valid bucketing, so the same oracle pins
    both paths (q:ks_drift_by_type_scalable shares
    q:ks_drift_by_type's oracle verbatim).

    Determinism: cumulative counts are integer
    sums; each D term is |exact-int/exact-int − exact-int/exact-int|,
    deterministic IEEE ops the oracle mirrors. Returns one row per
    group: (*group_cols, n_a, n_b, d_stat). Groups where either
    variant is EMPTY are dropped: D is undefined with one empty sample
    (0/0 division → NULL on Spark but +inf under IEEE engines — a
    cross-engine divergence and a meaningless statistic, ADVICE r6);
    callers monitoring for missing variants should count per-variant
    rows separately. A NULL value raises LOUDLY in both engines
    (:func:`_checked_measure`).
    """
    keys = list(group_cols)
    is_a = F.col(variant_col) == F.lit(variant_a)
    dist = df.select(
        *keys,
        variant_col,
        _checked_measure(
            F.col(value_col), "ks_drift_by_group", value_col
        ).alias(value_col),
    ).groupBy(*keys, value_col).agg(
        F.count(F.when(is_a, 1)).alias("__ca"),
        F.count(F.when(~is_a, 1)).alias("__cb"),
    )
    if bucket_of is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wg = Window.partitionBy(*keys)
        cum = (
            dist.withColumn("__cuma", F.sum("__ca").over(w))
            .withColumn("__cumb", F.sum("__cb").over(w))
            .withColumn("__na", F.sum("__ca").over(wg))
            .withColumn("__nb", F.sum("__cb").over(wg))
        )
    else:
        from .windows import _checked_offset

        op = "ks_drift_by_group"
        bkt = F.when(bucket_of.isNotNull(), bucket_of).otherwise(
            F.raise_error(
                F.lit(
                    f"{op}: bucket_of produced NULL for a non-NULL "
                    "value — the bucket expression must be a total, "
                    "non-NULL coarsening of the value"
                )
            )
        )
        tagged = dist.withColumn("__bkt", bkt)
        w_in = (
            Window.partitionBy(*keys, "__bkt")
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = tagged.withColumn(
            "__wa", F.sum("__ca").over(w_in)
        ).withColumn("__wb", F.sum("__cb").over(w_in))
        totals = tagged.groupBy(*keys, "__bkt").agg(
            F.sum("__ca").alias("__ta"),
            F.sum("__cb").alias("__tb"),
            F.min(value_col).alias("__om"),
            F.max(value_col).alias("__ox"),
        )
        w_b = (
            Window.partitionBy(*keys)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_lag = Window.partitionBy(*keys).orderBy("__bkt")
        wg = Window.partitionBy(*keys)
        offsets = totals.select(
            *keys,
            "__bkt",
            F.coalesce(F.sum("__ta").over(w_b), F.lit(0)).alias("__offa"),
            F.coalesce(F.sum("__tb").over(w_b), F.lit(0)).alias("__offb"),
            F.lag("__ox").over(w_lag).alias("__pox"),
            "__om",
            F.sum("__ta").over(wg).alias("__na"),
            F.sum("__tb").over(wg).alias("__nb"),
        ).select(
            *keys,
            "__bkt",
            _checked_offset(F.col("__offa"), op).alias("__offa"),
            "__offb",
            "__na",
            "__nb",
        )
        lhs, rhs = within.alias("__ksl"), offsets.alias("__ksr")
        cond = F.col("__ksl.__bkt").eqNullSafe(F.col("__ksr.__bkt"))
        for k in keys:
            cond = cond & F.col(f"__ksl.{k}").eqNullSafe(
                F.col(f"__ksr.{k}")
            )
        cum = lhs.join(rhs, cond).select(
            *[F.col(f"__ksl.{k}") for k in keys],
            (F.col("__ksl.__wa") + F.col("__ksr.__offa")).alias("__cuma"),
            (F.col("__ksl.__wb") + F.col("__ksr.__offb")).alias("__cumb"),
            F.col("__ksr.__na").alias("__na"),
            F.col("__ksr.__nb").alias("__nb"),
        )
    d = F.abs(
        F.col("__cuma").cast("double") / F.col("__na").cast("double")
        - F.col("__cumb").cast("double") / F.col("__nb").cast("double")
    )
    # drop one-variant groups BEFORE the division (ANSI mode would
    # raise on 0/0; __na/__nb are group constants so this row filter
    # removes exactly the undefined groups)
    return (
        cum.filter((F.col("__na") > 0) & (F.col("__nb") > 0))
        .groupBy(*keys)
        .agg(
            F.max("__na").cast("long").alias("n_a"),
            F.max("__nb").cast("long").alias("n_b"),
            F.max(d).alias("d_stat"),
        )
    )


def integer_tercile_buckets(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bucket_col: str = "bucket",
    labels: Sequence[str] = ("head", "middle", "tail"),
) -> DataFrame:
    """Per-group tercile bucketing with EXACT integer targets — the
    CCNet head/middle/tail split (documents bucketed by LM perplexity
    per language). exact_group_quantiles requires binary-fraction qs
    (1/3 is not one), so the tercile edges use pure integer ceilings:
    edge1 = smallest v with cum >= (n+2) div 3  (= ceil(n/3)),
    edge2 = smallest v with cum >= (2n+2) div 3 (= ceil(2n/3)),
    bucket = labels[0] if v <= edge1, labels[1] if v <= edge2, else
    labels[2]. Ties share a value and therefore a bucket — groups
    split |head| <= |middle| <= ... only up to tie mass, exactly
    reproducible in ANSI SQL.

    Scale: one hash aggregate to the per-(group, value) distribution,
    windows over that compact distribution (not the rows), and a
    broadcast-size edge table joined back — same skeleton as
    exact_group_quantiles. A NULL value raises LOUDLY in both engines
    (:func:`_checked_measure`) — it would shift the edge thresholds
    engine-dependently AND fall into the tail bucket silently.
    """
    keys = list(group_cols)
    dist = df.select(
        *keys,
        _checked_measure(
            F.col(value_col), "integer_tercile_buckets", value_col
        ).alias(value_col),
    ).groupBy(*keys, value_col).agg(F.count("*").alias("__c"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*keys)
    cum = dist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wg)
    )
    edges = cum.groupBy(*keys).agg(
        F.min(
            F.when(
                F.col("__cum") >= F.expr("(__n + 2) div 3"), F.col(value_col)
            )
        ).alias("__e1"),
        F.min(
            F.when(
                F.col("__cum") >= F.expr("(2 * __n + 2) div 3"),
                F.col(value_col),
            )
        ).alias("__e2"),
    )
    return (
        df.join(edges, keys)
        .withColumn(
            bucket_col,
            F.when(F.col(value_col) <= F.col("__e1"), F.lit(labels[0]))
            .when(F.col(value_col) <= F.col("__e2"), F.lit(labels[1]))
            .otherwise(F.lit(labels[2])),
        )
        .drop("__e1", "__e2")
    )


def psi_drift(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    variant_col: str,
    variant_ref: str = "A",
    n_bins: int = 10,
    smooth: int = 1,
) -> DataFrame:
    """Population Stability Index per group — the third leg of the
    drift-monitoring trio (chi2 for categoricals, KS for max-gap,
    PSI for the banked-binned score-drift convention: >0.2 is the
    standard retrain alarm). Bin edges are the REFERENCE variant's
    n_bins-quantiles with pure integer targets (ceil(i*n/b) =
    (i*n + b - 1) div b — no float q*n jitter for any b, unlike
    binary-fraction-only exact_group_quantiles); both variants are
    then counted into those fixed bins and

      PSI = Σ_bins (p_ref_i - p_cur_i) · ln(p_ref_i / p_cur_i)

    with add-``smooth`` count smoothing so empty bins stay finite.
    Every proportion is a ratio of exact integers, the ln argument one
    correctly-rounded division of exact products, and the 10-term sum
    is milli-quantized (ORACLE_NOTES rung 4) — hash-exact cross-engine.

    Scale: distribution aggregate + windows over the compact
    distribution for edges; two grouped counts; a bins-spine join so
    empty bins participate. Nothing row-scale after the first
    aggregate. Returns (group_cols..., n_ref, n_cur, psi_milli).

    Groups present ONLY in the current variant (no reference rows, so
    no bin edges exist — e.g. a brand-new event_type) are emitted as
    sentinel rows (n_ref=0, n_cur=count, psi_milli=NULL) rather than
    silently dropped: "never seen before" is exactly the condition a
    drift monitor must surface. Groups present only in the reference
    appear naturally with n_cur=0. A NULL value raises LOUDLY in both
    engines (:func:`_checked_measure`): the reference quantile edges
    come from the same cumulative-threshold machinery as
    exact_group_quantiles, where NULL placement is engine-dependent.
    """
    keys = list(group_cols)
    df = df.select(
        *keys,
        variant_col,
        _checked_measure(F.col(value_col), "psi_drift", value_col).alias(
            value_col
        ),
    )
    ref = df.filter(F.col(variant_col) == F.lit(variant_ref))
    cur = df.filter(F.col(variant_col) != F.lit(variant_ref))
    dist = ref.groupBy(*keys, value_col).agg(F.count("*").alias("__c"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*keys)
    cum = dist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wg)
    )
    edge_aggs = [
        F.min(
            F.when(
                F.col("__cum")
                >= F.expr(f"({i} * __n + {n_bins - 1}) div {n_bins}"),
                F.col(value_col),
            )
        ).alias(f"__e{i}")
        for i in range(1, n_bins)
    ]
    edges = cum.groupBy(*keys).agg(*edge_aggs)

    def _bin(c):
        b = F.lit(n_bins)
        for i in range(n_bins - 1, 0, -1):
            b = F.when(c <= F.col(f"__e{i}"), F.lit(i)).otherwise(b)
        return b

    def _counts(side, alias):
        return (
            side.join(edges, keys)
            .select(*keys, _bin(F.col(value_col)).alias("__bin"))
            .groupBy(*keys, "__bin")
            .agg(F.count("*").alias(alias))
        )

    spine = (
        edges.select(*keys)
        .select(*keys, F.explode(F.sequence(F.lit(1), F.lit(n_bins))).alias("__bin"))
    )
    ca = _counts(ref, "__ca")
    cb = _counts(cur, "__cb")
    binned = (
        spine.join(ca, [*keys, "__bin"], "left")
        .join(cb, [*keys, "__bin"], "left")
        .select(
            *keys,
            "__bin",
            (F.coalesce("__ca", F.lit(0)) + F.lit(smooth)).alias("__a"),
            (F.coalesce("__cb", F.lit(0)) + F.lit(smooth)).alias("__b"),
        )
    )
    totals = binned.groupBy(*keys).agg(
        F.sum("__a").alias("__na"), F.sum("__b").alias("__nb")
    )
    term = (
        F.col("__a").cast("double") / F.col("__na").cast("double")
        - F.col("__b").cast("double") / F.col("__nb").cast("double")
    ) * F.log(
        (F.col("__a") * F.col("__nb")).cast("double")
        / (F.col("__b") * F.col("__na")).cast("double")
    )
    scored = (
        binned.join(totals, keys)
        .groupBy(*keys)
        .agg(
            (F.max("__na") - F.lit(smooth * n_bins)).alias("n_ref"),
            (F.max("__nb") - F.lit(smooth * n_bins)).alias("n_cur"),
            F.round(F.sum(term) * F.lit(1000.0)).cast("long").alias(
                "psi_milli"
            ),
        )
    )
    cur_only = (
        cur.join(edges.select(*keys), keys, "left_anti")
        .groupBy(*keys)
        .agg(F.count("*").alias("n_cur"))
        .select(
            *keys,
            F.lit(0).cast("long").alias("n_ref"),
            F.col("n_cur"),
            F.lit(None).cast("long").alias("psi_milli"),
        )
    )
    return scored.unionByName(cur_only)


def grouped_ols_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: Column | str,
    y_col: Column | str,
    scale: int = 10**6,
) -> DataFrame:
    """Per-group ordinary-least-squares linear trend from EXACT
    sufficient statistics: one hash aggregate computes (n, Σx, Σy,
    Σxy, Σx², Σy²) as DECIMAL(38,0) (callers pass integer-quantized
    x/y — day index, cents), then

      slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
      intercept = (Σy − slope·Σx) / n
      r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    Numerators and denominators are computed EXACTLY in decimal
    (Spark) / HUGEINT (the DuckDB mirror) — int64 or double sums
    would overflow/round for realistic cents-scale inputs (Σy² passes
    2^53 after ~25 rows of 6e7-cent values, making the result
    accumulation-order-dependent across engines). Each exact quantity
    is cast to double ONCE, the divisions run in a fixed order, and
    outputs are ``scale``-quantized ints — hash-identical cross-engine
    (the same rung-4 discipline as psi/KS/bootstrap). Exactness bound
    (documented, not silently truncated): per-term products |x·y|,
    x², y² must stay under ~1e18 and group totals n·Σ under ~1e38 —
    true for day-index × cents at any TPC-H scale. Past that boundary
    the engines fail DIFFERENTLY (never wrongly): Spark decimal
    overflow yields NULL sums (ANSI off) while the DuckDB mirror's
    HUGEINT overflow raises a runtime error — a documented asymmetry,
    not a silent divergence: one engine errors, the other emits NULL
    outputs, neither produces a plausible-but-wrong number.

    Degenerate groups are explicit, not NaN: a group with n < 2 or
    zero x-variance emits NULL slope/intercept/r2 (vertical or
    undetermined fit); zero y-variance with nonzero x-variance emits
    slope normally and r2 = NULL — the variance tests compare EXACT
    decimals to zero, so a constant-y group is NULL-r2 at any
    magnitude (a float den_y would miss it past 2^53).

    Scale: ONE map-side-combining aggregate over the fact rows;
    nothing row-scale after it. The group-trend screen for metric
    drift ("which suppliers' daily revenue is decaying?") at any
    corpus size.

    Returns (group_cols..., n, slope_scaled, intercept_scaled,
    r2_milli).
    """
    keys = list(group_cols)
    dec = "decimal(18,0)"
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast(dec)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast(dec)
    agg = df.groupBy(*keys).agg(
        F.count("*").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    big = "decimal(38,0)"
    n_d = F.col("__n").cast(big)
    sx = F.col("__sx").cast(big)
    sy = F.col("__sy").cast(big)
    num = (n_d * F.col("__sxy").cast(big) - sx * sy).cast(big)
    den_x = (n_d * F.col("__sxx").cast(big) - sx * sx).cast(big)
    den_y = (n_d * F.col("__syy").cast(big) - sy * sy).cast(big)
    num_f = num.cast("double")
    den_x_f = F.nullif(den_x, F.lit(0).cast(big)).cast("double")
    slope = num_f / den_x_f
    intercept = (sy.cast("double") - slope * sx.cast("double")) / F.col(
        "__n"
    ).cast("double")
    r2 = (num_f * num_f) / F.nullif(
        den_x.cast("double") * den_y.cast("double"), F.lit(0.0)
    )
    # exact zero-variance tests (decimal compare, not float)
    r2 = F.when(
        (den_x == F.lit(0).cast(big)) | (den_y == F.lit(0).cast(big)),
        F.lit(None).cast("double"),
    ).otherwise(r2)
    s = F.lit(float(scale))
    return agg.select(
        *keys,
        F.col("__n").alias("n"),
        F.when(
            F.col("__n") >= 2, F.round(slope * s).cast("long")
        ).alias("slope_scaled"),
        F.when(
            F.col("__n") >= 2, F.round(intercept * s).cast("long")
        ).alias("intercept_scaled"),
        F.when(
            F.col("__n") >= 2, F.round(r2 * F.lit(1000.0)).cast("long")
        ).alias("r2_milli"),
    )


def grouped_ols_trend_sql(
    source_select: str,
    group_cols: Sequence[str],
    x_expr: str,
    y_expr: str,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`grouped_ols_trend`: identical EXACT
    sufficient statistics (HUGEINT = int128, matching Spark's
    decimal(38,0)), identical one-cast-to-double-then-divide order,
    identical quantization and exact zero-variance tests.
    ``source_select`` yields the group cols plus the x/y expressions'
    inputs."""
    keys = ", ".join(group_cols)
    return f"""
WITH src AS ({source_select}),
agg AS (
  SELECT {keys},
         count(*) AS n,
         sum(CAST({x_expr} AS HUGEINT)) AS sx,
         sum(CAST({y_expr} AS HUGEINT)) AS sy,
         sum(CAST({x_expr} AS HUGEINT) * CAST({y_expr} AS HUGEINT))
           AS sxy,
         sum(CAST({x_expr} AS HUGEINT) * CAST({x_expr} AS HUGEINT))
           AS sxx,
         sum(CAST({y_expr} AS HUGEINT) * CAST({y_expr} AS HUGEINT))
           AS syy
  FROM src GROUP BY {keys}
),
ex AS (
  SELECT {keys}, n,
         CAST(n AS HUGEINT) * sxy - sx * sy AS num,
         CAST(n AS HUGEINT) * sxx - sx * sx AS den_x,
         CAST(n AS HUGEINT) * syy - sy * sy AS den_y,
         sx, sy
  FROM agg
)
SELECT {keys}, CAST(n AS BIGINT) AS n,
  CASE WHEN n >= 2 THEN CAST(round(
    CAST(num AS DOUBLE) / CAST(nullif(den_x, 0) AS DOUBLE)
    * {scale}.0) AS BIGINT) END AS slope_scaled,
  CASE WHEN n >= 2 THEN CAST(round(
    (CAST(sy AS DOUBLE)
      - CAST(num AS DOUBLE) / CAST(nullif(den_x, 0) AS DOUBLE)
        * CAST(sx AS DOUBLE))
      / CAST(n AS DOUBLE)
    * {scale}.0) AS BIGINT) END AS intercept_scaled,
  CASE WHEN n >= 2 AND den_x <> 0 AND den_y <> 0 THEN CAST(round(
    (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
      / nullif(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE), 0.0)
    * 1000.0) AS BIGINT) END AS r2_milli
FROM ex
"""


def theil_sen_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: Column | str,
    y_col: Column | str,
    scale: int = 10**6,
    max_points: int = 2000,
    pair_block_size: int | None = None,
) -> DataFrame:
    """Per-group Theil–Sen ROBUST linear trend (Theil 1950 / Sen 1968,
    the standard high-breakdown complement to :func:`grouped_ols_trend`
    — a single corrupted telemetry point can move an OLS slope
    arbitrarily; Theil–Sen tolerates ~29% outliers):

      slope = median over pairs (i, j), x_i < x_j of
              (y_j − y_i) / (x_j − x_i)
      intercept = median over points of (y_i − slope·x_i)

    Median semantics are the repo's pinned DISCRETE quantile (smallest
    value with cum >= ceil(n/2) — exact_group_quantiles), not an
    interpolated midpoint: the result is always an actually-occurring
    slope/residual, and the oracle pins the definition in plain SQL
    instead of trusting any engine's median builtin. Pairs with tied x
    are excluded (slope undefined — the standard treatment); a group
    with no untied pair (n < 2 or constant x) emits NULL slope and
    intercept with its counts, mirroring the OLS degenerate contract.

    Exactness: x/y are used as doubles (callers pass integer-quantized
    grains — day index, cents — exact below 2^53); each slope is ONE
    correctly-rounded double division, residuals one multiply +
    subtract in fixed order, and the discrete median SELECTS one of
    those values — so both engines hash-identically after
    ``scale``-quantization, the same rung as grouped_ols_trend.

    NULL discipline (round-12, ADVICE r11): a NULL ``x_col`` or
    ``y_col`` raises LOUDLY in both engines before pair generation —
    a NULL pairwise slope would otherwise enter the discrete-median
    machinery where Spark windows order NULLS FIRST but the SQL
    mirror's ORDER BY puts them LAST, silently shifting the median.
    Filter or impute missing measurements upstream. NULL GROUP KEYS
    are a real group (the same window/groupBy semantics as the rest
    of the repo): every internal join is null-safe, so a NULL-key
    group with >= 2 untied points gets a real slope instead of being
    silently dropped at a name-list join.

    Scale contract: the pair set is O(n²) per group BY DEFINITION —
    this is a calendar-bounded-grain operator like ewma_grouped, and
    the bound is ENFORCED (a group beyond ``max_points`` raises
    loudly, both engines). Default 2000 points -> <= ~2M pair rows per
    group; note the DEFAULT pair join keys ONLY on the group, so each
    group's full pair set is generated (and its median distribution
    built) within a single task — ``max_points`` therefore bounds
    PER-TASK memory, not just total work. For fact-scale robust
    trends, aggregate to the grain first — that is the documented
    usage of the whole trend-screen family.

    ``pair_block_size`` (round-12) lifts the single-task ceiling for
    callers who legitimately need larger groups: points are numbered
    in x-order per group and blocked into runs of that size, pairs
    decompose into (block_i <= block_j) tiles joined on
    (group, i, j) — per-task pair generation is then bounded by
    ``pair_block_size²`` instead of n², and the slope median runs
    through :func:`scalable_group_quantiles` bucketed by the slope's
    signed log2 band (monotone by construction; distributes whenever
    slopes span magnitude bands, degrades gracefully to the plain
    per-group window when every pairwise slope falls in one band).
    The generated PAIR SET is identical to the default path —
    blocking respects the x-order, the x_a < x_b condition picks the
    same orientation, tied-x pairs are excluded in both — so results
    are bit-identical and the same plain-SQL oracle pins both
    (q:nation_theil_sen_blocked shares q:nation_theil_sen_trend's
    oracle verbatim). ``max_points`` still bounds TOTAL per-group
    work (raise it deliberately alongside pair_block_size).

    Returns (group_cols..., n_points, n_pairs, slope_scaled,
    intercept_scaled).
    """
    keys = list(group_cols)
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    if max_points <= 0:
        raise ValueError(f"max_points must be positive, got {max_points}")

    def _checked(c: Column, name: str) -> Column:
        return F.when(
            c.isNull(),
            F.raise_error(
                F.lit(
                    f"theil_sen_trend: NULL {name} — filter or impute "
                    "missing measurements before the trend (a NULL "
                    "pairwise slope would shift the discrete median "
                    "engine-dependently)"
                )
            ).cast("double"),
        ).otherwise(c)

    def _ns_join(left, right, how, right_cols):
        # null-safe key join that preserves NULL group keys as a real
        # group (ADVICE r11: name-list joins silently dropped them)
        lhs, rhs = left.alias("__tsl"), right.alias("__tsr")
        cond = None
        for k in keys:
            c = F.col(f"__tsl.{k}").eqNullSafe(F.col(f"__tsr.{k}"))
            cond = c if cond is None else (cond & c)
        return lhs.join(rhs, cond, how).select(
            *[F.col(f"__tsl.{c2}") for c2 in left.columns],
            *[F.col(f"__tsr.{c2}").alias(c2) for c2 in right_cols],
        )

    # the grain table is referenced by FIVE branches (counts, both pair
    # sides, residuals, output join) — checkpoint it so an expensive
    # upstream (joins + aggregation to the grain) runs once, not per
    # branch (the tfidf_topk_similar discipline); the table itself is
    # grain-sized, tiny next to the fact
    src = df.select(
        *keys, _checked(x, "x").alias("__x"), _checked(y, "y").alias("__y")
    ).localCheckpoint()
    counts = src.groupBy(*keys).agg(F.count("*").alias("n_points"))
    guarded = _ns_join(src, counts, "inner", ["n_points"]).withColumn(
        "__x",
        F.when(
            F.col("n_points") <= F.lit(int(max_points)), F.col("__x")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("theil_sen_trend: group size "),
                    F.col("n_points").cast("string"),
                    F.lit(f" exceeds max_points={int(max_points)}"),
                )
            ).cast("double")
        ),
    )
    slope = (
        (F.col("__tsb.__y") - F.col("__tsa.__y"))
        / (F.col("__tsb.__x") - F.col("__tsa.__x"))
    ).alias("__m")
    if pair_block_size is None:
        a = guarded.alias("__tsa")
        bb = guarded.alias("__tsb")
        cond = None
        for k in keys:
            c = F.col(f"__tsa.{k}").eqNullSafe(F.col(f"__tsb.{k}"))
            cond = c if cond is None else (cond & c)
        cond = cond & (F.col("__tsa.__x") < F.col("__tsb.__x"))
        slopes = a.join(bb, cond).select(
            *[F.col(f"__tsa.{k}").alias(k) for k in keys], slope
        )
        med_m = exact_group_quantiles(slopes, keys, "__m", qs=(0.5,)).select(
            *keys, F.col("n").alias("n_pairs"), F.col("q50").alias("__med_m")
        )
    else:
        if pair_block_size <= 0:
            raise ValueError(
                f"pair_block_size must be positive, got {pair_block_size}"
            )
        bs = int(pair_block_size)
        # number points in x-order per group (ties get arbitrary but
        # irrelevant relative order: tied-x pairs are excluded, and
        # x_a < x_b already implies idx_a < idx_b); the sort is
        # per-group over POINTS (<= max_points), not pairs
        w_idx = Window.partitionBy(*keys).orderBy("__x")
        blocked = guarded.withColumn(
            "__blk",
            F.floor((F.row_number().over(w_idx) - 1) / F.lit(bs)).cast(
                "long"
            ),
        ).withColumn(
            "__nblk",
            F.floor((F.col("n_points") + bs - 1) / F.lit(bs)).cast("long"),
        )
        # tile expansion: point in block b serves as the LEFT side of
        # tiles (b, j>=b) and the RIGHT side of tiles (i<=b, b); the
        # join key (group, i, j) caps per-task pair generation at bs²
        a = blocked.withColumn(
            "__j", F.explode(F.sequence(F.col("__blk"), F.col("__nblk") - 1))
        ).select(*keys, "__x", "__y", F.col("__blk").alias("__i"), "__j"
        ).alias("__tsa")
        bb = blocked.withColumn(
            "__i", F.explode(F.sequence(F.lit(0).cast("long"), F.col("__blk")))
        ).select(*keys, "__x", "__y", "__i", F.col("__blk").alias("__j")
        ).alias("__tsb")
        cond = (F.col("__tsa.__i") == F.col("__tsb.__i")) & (
            F.col("__tsa.__j") == F.col("__tsb.__j")
        )
        for k in keys:
            cond = cond & F.col(f"__tsa.{k}").eqNullSafe(F.col(f"__tsb.{k}"))
        cond = cond & (F.col("__tsa.__x") < F.col("__tsb.__x"))
        slopes = a.join(bb, cond).select(
            *[F.col(f"__tsa.{k}").alias(k) for k in keys], slope
        )
        # signed log2 magnitude band: a monotone, non-NULL, value-only
        # coarsening of the slope (0 -> 0; positives -> 2048+floor(
        # log2 m) in [974, 3071]; negatives mirrored below zero), so
        # the median's cumulative counts decompose without a per-group
        # single-task window over the (up to O(n²)-distinct) slopes
        band = (
            F.when(F.col("__m") == 0.0, F.lit(0).cast("long"))
            .when(
                F.col("__m") > 0.0,
                (F.floor(F.log2(F.col("__m"))) + 2048).cast("long"),
            )
            .otherwise(
                -(F.floor(F.log2(-F.col("__m"))) + 2048).cast("long")
            )
        )
        med_m = scalable_group_quantiles(
            slopes, keys, "__m", bucket_of=band, qs=(0.5,)
        ).select(
            *keys, F.col("n").alias("n_pairs"), F.col("q50").alias("__med_m")
        )
    resid = _ns_join(src, med_m, "inner", ["n_pairs", "__med_m"]).select(
        *keys,
        "__med_m",
        "n_pairs",
        (F.col("__y") - F.col("__med_m") * F.col("__x")).alias("__b"),
    )
    med_b = exact_group_quantiles(resid, keys, "__b", qs=(0.5,)).select(
        *keys, F.col("q50").alias("__med_b")
    )
    s = F.lit(float(scale))
    return (
        _ns_join(
            _ns_join(counts, med_m, "left", ["n_pairs", "__med_m"]),
            med_b,
            "left",
            ["__med_b"],
        )
        .select(
            *keys,
            "n_points",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias(
                "n_pairs"
            ),
            F.round(F.col("__med_m") * s).cast("long").alias(
                "slope_scaled"
            ),
            F.round(F.col("__med_b") * s).cast("long").alias(
                "intercept_scaled"
            ),
        )
    )


def theil_sen_trend_sql(
    source_select: str,
    group_cols: Sequence[str],
    x_expr: str,
    y_expr: str,
    scale: int = 10**6,
    max_points: int = 2000,
) -> str:
    """DuckDB mirror of :func:`theil_sen_trend`: identical pair
    generation (tied x excluded), identical double arithmetic, the
    identical DISCRETE median construction (smallest value with
    cum >= ceil(n/2) — plain SQL, not the engine's median builtin),
    identical loud group-size guard, identical loud NULL-x/y guard,
    identical NULL degenerate rows, and identical null-safe key joins
    (NULL group keys are a real group in both engines — ADVICE r11).
    ``source_select`` yields group cols + x + y."""
    if max_points <= 0:
        raise ValueError(f"max_points must be positive, got {max_points}")
    keys = ", ".join(group_cols)
    ka = ", ".join(f"a.{k}" for k in group_cols)
    on = " AND ".join(f"b.{k} IS NOT DISTINCT FROM a.{k}" for k in group_cols)
    on_sc = " AND ".join(
        f"c.{k} IS NOT DISTINCT FROM s.{k}" for k in group_cols
    )
    on_sm = " AND ".join(
        f"mm.{k} IS NOT DISTINCT FROM s.{k}" for k in group_cols
    )
    on_cm = " AND ".join(
        f"mm.{k} IS NOT DISTINCT FROM c.{k}" for k in group_cols
    )
    on_cb = " AND ".join(
        f"mb.{k} IS NOT DISTINCT FROM c.{k}" for k in group_cols
    )
    null_msg = (
        "theil_sen_trend: NULL {0} — filter or impute missing "
        "measurements before the trend (a NULL pairwise slope would "
        "shift the discrete median engine-dependently)"
    )
    return f"""
WITH src AS (
  SELECT {keys},
         CASE WHEN ({x_expr}) IS NULL
              THEN CAST(error('{null_msg.format("x")}') AS DOUBLE)
              ELSE CAST({x_expr} AS DOUBLE) END AS x,
         CASE WHEN ({y_expr}) IS NULL
              THEN CAST(error('{null_msg.format("y")}') AS DOUBLE)
              ELSE CAST({y_expr} AS DOUBLE) END AS y
  FROM ({source_select})
),
counts AS (
  SELECT {keys}, count(*) AS n_points FROM src GROUP BY {keys}
),
guarded AS (
  SELECT s.*,
         CASE WHEN c.n_points <= {int(max_points)} THEN s.x
              ELSE error('theil_sen_trend: group size '
                         || CAST(c.n_points AS VARCHAR)
                         || ' exceeds max_points={int(max_points)}')
         END AS gx
  FROM src s JOIN counts c ON {on_sc}
),
slopes AS (
  SELECT {ka}, (b.y - a.y) / (b.gx - a.gx) AS m
  FROM guarded a JOIN guarded b ON {on} AND a.gx < b.gx
),
mdist AS (
  SELECT {keys}, m, count(*) AS c FROM slopes GROUP BY {keys}, m
),
mcum AS (
  SELECT {keys}, m,
         sum(c) OVER (PARTITION BY {keys} ORDER BY m
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY {keys}) AS n
  FROM mdist
),
med_m AS (
  SELECT {keys}, CAST(max(n) AS BIGINT) AS n_pairs,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN m END) AS med_m
  FROM mcum GROUP BY {keys}
),
resid AS (
  SELECT s.*, mm.med_m, s.y - mm.med_m * s.x AS b
  FROM src s JOIN med_m mm ON {on_sm}
),
bdist AS (
  SELECT {keys}, b, count(*) AS c FROM resid GROUP BY {keys}, b
),
bcum AS (
  SELECT {keys}, b,
         sum(c) OVER (PARTITION BY {keys} ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY {keys}) AS n
  FROM bdist
),
med_b AS (
  SELECT {keys}, min(CASE WHEN cum >= ceil(0.5 * n) THEN b END) AS med_b
  FROM bcum GROUP BY {keys}
)
SELECT c.{', c.'.join(group_cols) if group_cols else ''},
       CAST(c.n_points AS BIGINT) AS n_points,
       CAST(COALESCE(mm.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(round(mm.med_m * {float(scale)!r}) AS BIGINT) AS slope_scaled,
       CAST(round(mb.med_b * {float(scale)!r}) AS BIGINT)
         AS intercept_scaled
FROM counts c
LEFT JOIN med_m mm ON {on_cm}
LEFT JOIN med_b mb ON {on_cb}
"""
