"""Skewed-key replica bench: measure salted vs unsalted shapes on a
zipf-keyed fact table (VERDICT r2 follow-up #8).

Generates a fact table whose key frequencies follow a zipf-like law
(hottest key holds ~30% of all rows — the "one customer is a third of
the traffic" shape), then times:

- plain shuffle equi-join vs ``salted_join`` (broadcast disabled so
  both shuffle; AQE off so its skew-split does not mask the hot
  reducer — the operator exists precisely for the shapes AQE cannot
  split, and the AQE-on number is reported too for honesty);
- ranking-window top-k per key vs ``partial_topk`` (AQE cannot split
  window partitions at all, so the window number is the real
  production hazard).

Each timing is min-of-3 warm runs on a count() sink. Results are
printed as markdown rows for BASELINE.md.

Usage: python scripts/bench_skew.py [n_rows] [n_keys]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_spark_spark.operators.skew import salted_join  # noqa: E402
from etl_spark_spark.operators.windows import partial_topk  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark(app_name="bench-skew", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # zipf key: P(key=j) ~ 1/(j+2)^3; key 0 ends up with ~66% of rows
    # (the "one customer is a third of the traffic" shape). Inverse-CDF
    # via partial sums, computed inline from a uniform hash —
    # deterministic, generated fully distributed.
    h = [0.0]
    for j in range(n_keys):
        h.append(h[-1] + 1.0 / (j + 2) ** 3)
    total = h[-1]
    bounds = [x / total for x in h[1:]]
    fact = (
        spark.range(n_rows)
        .withColumn("u", F.pmod(F.xxhash64("id"), F.lit(1 << 20)) / (1 << 20))
        .withColumn(
            "k",
            F.size(
                F.filter(
                    F.array(*[F.lit(b) for b in bounds]),
                    lambda b: b < F.col("u"),
                )
            ).cast("long"),
        )
        .withColumn("v", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)))
        .select("id", "k", "v")
        .localCheckpoint()  # pin the replica so timings exclude generation
    )
    hot_share = (
        fact.groupBy("k").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    print(
        f"replica: {n_rows} rows, {n_keys} keys, hottest key {hot_share['k']} "
        f"holds {hot_share['count'] / n_rows:.1%}"
    )

    dim = (
        spark.range(n_keys)
        .select(F.col("id").alias("k"), (F.col("id") * 7).alias("dim_v"))
        .localCheckpoint()
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def join_plain():
        fact.join(dim, "k").agg(F.sum("dim_v")).collect()

    def join_salted():
        salted_join(fact, dim, ["k"], buckets=32).agg(F.sum("dim_v")).collect()

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_plain_noaqe = timeit(join_plain)
    t_salted_noaqe = timeit(join_salted)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t_plain_aqe = timeit(join_plain)
    t_salted_aqe = timeit(join_salted)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    order = F.struct(F.col("v").alias("o1"), F.col("id").alias("o2"))

    def topk_window():
        w = Window.partitionBy("k").orderBy(F.desc("v"), F.desc("id"))
        (
            fact.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .agg(F.count("*"))
            .collect()
        )

    def topk_partial():
        partial_topk(fact, ["k"], order, k=5).agg(F.count("*")).collect()

    t_win = timeit(topk_window)
    t_partial = timeit(topk_partial)

    # superdesconto's flagship shape (round-7 VERDICT task 7): top-1
    # per zipf-hot key — the etiqueta barcode replica. The engine's
    # max_by aggregate (top_one_per_group_agg, the exact operator the
    # pipeline uses) vs the ranking-window form the reference's global
    # sort implies. partial_max_by combines the hot key map-side, so
    # the hot reducer receives ~one row per mapper; the window ships
    # and sorts the hot key's full row set on one task.
    from etl_spark_spark.operators.windows import top_one_per_group_agg

    top1_order = F.struct(
        F.col("v").alias("o1"), (-F.col("id")).alias("o2")
    )

    def top1_window():
        w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("id"))
        (
            fact.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .agg(F.count("*"))
            .collect()
        )

    def top1_maxby():
        (
            top_one_per_group_agg(fact, ["k"], top1_order)
            .agg(F.count("*"))
            .collect()
        )

    t_top1_win = timeit(top1_window)
    t_top1_agg = timeit(top1_maxby)

    # ressarcimento's allocation shape (round-10 VERDICT task 7): the
    # windowed per-group loss denominator (utils_ressarcimento.py:229's
    # sum over cnpj_forn_pai) followed by the proportional-allocation
    # cascade, under one dominant supplier hierarchy. The window form
    # ships the hot group's full row set to one task (AQE cannot split
    # window partitions); partitioned_sum_agg partial-aggregates the
    # totals map-side and broadcast-joins them back — zero fact shuffle.
    from etl_spark_spark.operators.reconcile import allocate_proportional
    from etl_spark_spark.operators.windows import (
        partitioned_sum,
        partitioned_sum_agg,
    )

    def alloc(form):
        withtot = form(fact, ["k"], "v", "grp_total")
        out = allocate_proportional(
            withtot, "v", "grp_total", F.lit(1000.0), "rateio"
        )
        out.agg(F.sum("rateio"), F.count("*")).collect()

    t_alloc_win = timeit(lambda: alloc(partitioned_sum))
    t_alloc_agg = timeit(lambda: alloc(partitioned_sum_agg))
    # the plan property the pipeline relies on (also pinned by
    # tests/test_plans.py::test_superdesconto_top1_partial_aggregates…)
    plan = (
        top_one_per_group_agg(fact, ["k"], top1_order)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max_by" in plan, "max_by lost its partial aggregation"

    print("| shape | unsalted | salted | speedup |")
    print("|---|---|---|---|")
    print(
        f"| shuffle join, AQE off | {t_plain_noaqe:.2f} s | "
        f"{t_salted_noaqe:.2f} s | {t_plain_noaqe / t_salted_noaqe:.2f}x |"
    )
    print(
        f"| shuffle join, AQE on (skew-split) | {t_plain_aqe:.2f} s | "
        f"{t_salted_aqe:.2f} s | {t_plain_aqe / t_salted_aqe:.2f}x |"
    )
    print(
        f"| top-5 per key (window vs partial_topk) | {t_win:.2f} s | "
        f"{t_partial:.2f} s | {t_win / t_partial:.2f}x |"
    )
    print(
        f"| superdesconto top-1 per etiqueta (window vs max_by agg, "
        f"partial_max_by pinned) | {t_top1_win:.2f} s | "
        f"{t_top1_agg:.2f} s | {t_top1_win / t_top1_agg:.2f}x |"
    )
    print(
        f"| ressarcimento allocation denominator (window vs "
        f"partitioned_sum_agg broadcast-back) | {t_alloc_win:.2f} s | "
        f"{t_alloc_agg:.2f} s | {t_alloc_win / t_alloc_agg:.2f}x |"
    )


if __name__ == "__main__":
    main()
