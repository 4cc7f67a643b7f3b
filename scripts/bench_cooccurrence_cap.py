"""Hub-basket replica bench: show the co-occurrence pair stage stays
bounded under the MAX_BASKET cap while the uncapped form blows up
(VERDICT r3 follow-up #2).

Generates a customer->part incidence replica shaped like a real basket
distribution plus a few "reseller account" hubs: ``n_cust`` customers
with ~10 distinct parts each, and ``n_hubs`` hub customers with
``hub_parts`` distinct parts each. The pair self-join on o_custkey is
quadratic per basket, so each hub contributes hub_parts*(hub_parts-1)/2
candidate pairs before the support filter can drop them — the exact
shape that detonates at 100x when one account holds 1e5 parts.

Times (min-of-3 warm, count() sink) the full pair+cosine pipeline:
- uncapped: the pre-round-4 formulation
- capped: basket-size count window, baskets > 200 dropped

Usage: python scripts/bench_cooccurrence_cap.py [n_cust] [n_hubs] [hub_parts]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_spark_spark.session import get_spark  # noqa: E402

MAX_BASKET = 200


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def pair_cosine(inc: DataFrame, cap: int | None) -> DataFrame:
    if cap is not None:
        wb = Window.partitionBy("o_custkey")
        inc = (
            inc.withColumn("__bsz", F.count("*").over(wb))
            .filter(F.col("__bsz") <= cap)
            .drop("__bsz")
        )
    deg = inc.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a, b = inc.alias("a"), inc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 3)
    )
    da = deg.withColumnsRenamed({"l_partkey": "part_a", "n": "n_a"})
    db = deg.withColumnsRenamed({"l_partkey": "part_b", "n": "n_b"})
    return (
        pairs.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "shared",
            (
                F.col("shared").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )


def main() -> None:
    n_cust = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_hubs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    hub_parts = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark(app_name="bench-cooc-cap", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # normal baskets: ~10 distinct parts drawn from a 20k-part catalog
    normals = spark.range(n_cust * 10).select(
        (F.col("id") / 10).cast("long").alias("o_custkey"),
        F.pmod(F.xxhash64("id"), F.lit(20_000)).alias("l_partkey"),
    )
    # hub baskets: sequential distinct parts (reseller accounts)
    hubs = spark.range(n_hubs * hub_parts).select(
        (F.lit(10_000_000) + (F.col("id") / hub_parts).cast("long")).alias(
            "o_custkey"
        ),
        F.pmod(F.col("id"), F.lit(hub_parts)).alias("l_partkey"),
    )
    inc = normals.unionByName(hubs).distinct().localCheckpoint()
    n_inc = inc.count()
    hub_pairs = n_hubs * hub_parts * (hub_parts - 1) // 2
    print(
        f"replica: {n_inc} incidence rows; {n_hubs} hubs x {hub_parts} parts "
        f"-> {hub_pairs:,} uncapped hub candidate pairs"
    )

    def run(cap):
        pair_cosine(inc, cap).agg(F.count("*")).collect()

    t_capped = timeit(lambda: run(MAX_BASKET))
    t_uncapped = timeit(lambda: run(None), n=1)

    print("| formulation | wall (warm) | note |")
    print("|---|---|---|")
    print(
        f"| capped (basket <= {MAX_BASKET}) | {t_capped:.2f} s | "
        f"hub pair fanout never materializes |"
    )
    print(
        f"| uncapped | {t_uncapped:.2f} s | "
        f"{hub_pairs:,} extra candidate pairs on {n_hubs} join keys |"
    )
    print(f"| blowup factor | {t_uncapped / t_capped:.1f}x | |")


if __name__ == "__main__":
    main()
