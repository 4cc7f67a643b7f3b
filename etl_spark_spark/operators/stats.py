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
    engine's quantile builtin.
    """
    keys = list(group_cols)
    dist = df.groupBy(*keys, value_col).agg(F.count("*").alias("__c"))
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
    single-task global window. Returns one row:
    (n_a, n_b, d_stat)."""
    from .windows import scalable_running_sum

    is_a = F.col(variant_col) == F.lit(variant_a)
    dist = (
        df.groupBy(value_col)
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
    """
    is_a = F.col(variant_col) == F.lit(variant_a)
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
    weights are exact under any shuffle order.
    """
    keys = list(group_cols)
    dist = df.groupBy(*keys, value_col).agg(
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
