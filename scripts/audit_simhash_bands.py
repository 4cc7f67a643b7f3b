"""Band-bucket-width audit for the SimHash multi-index PROBE plan
(verdict-r8 task 6): show that the 4x15-bit band keys stay SPARSE over
distinct (twin-collapsed) simhash values at the 100x replica — the
failure mode of the old 11x5-bit equality plan was exactly dense keys
(32 distinct values per band => Omega(n^2/32) per-band collisions).

Measures, over the post side the probe join actually builds
(plan_simhash_probe(threshold) bands over DISTINCT collapsed values):

- distinct simhash values (the collapse output — replication-invariant);
- per-(band, key) bucket width: max, p99, mean, and the candidate
  volume those widths imply (sum w^2 per band upper-bounds the
  equality-collision share of the probe join's output);
- wall of the full neardup_simhash_exact-equivalent pipeline
  (simhash_near_dup(exact_recall=True) count) on the same data.

Usage: python scripts/audit_simhash_bands.py [replica_dir]
Prints markdown rows for BASELINE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_spark_spark.functions.text import tokens  # noqa: E402
from etl_spark_spark.operators.neardup import (  # noqa: E402
    plan_simhash_probe,
    simhash,
    simhash_near_dup,
)
from etl_spark_spark.session import get_spark  # noqa: E402

THRESHOLD = 10  # q_neardup_simhash_exact's setting


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/replica_100x"
    spark = get_spark(
        app_name="audit-simhash-bands", cpus=32, shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    num_bands, band_bits, flips = plan_simhash_probe(THRESHOLD)

    sh_docs = simhash(docs, "doc_id", tokens("text"))
    n_docs = sh_docs.count()
    reps = (
        sh_docs.withColumn(
            "__rep", F.min("doc_id").over(Window.partitionBy("simhash"))
        )
        .filter(F.col("doc_id") == F.col("__rep"))
        .select("simhash")
    )
    mask = (1 << band_bits) - 1
    widths = (
        reps.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("simhash"), band_bits * b)
                            .bitwiseAND(F.lit(mask))
                            .alias("key"),
                        )
                        for b in range(num_bands)
                    ]
                )
            ).alias("bk")
        )
        .groupBy("bk.band", "bk.key")
        .count()
    )
    stats = widths.agg(
        F.count("*").alias("buckets"),
        F.sum("count").alias("vals"),
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.avg("count").alias("mean"),
        F.sum(F.expr("count * (count - 1) / 2")).alias("eq_collisions"),
    ).collect()[0]
    n_vals = stats["vals"] // num_bands

    t0 = time.time()
    n_pairs = simhash_near_dup(
        docs, "doc_id", tokens("text"), threshold=THRESHOLD,
        exact_recall=True,
    ).count()
    wall = time.time() - t0

    print(
        f"| {sf_dir} | {n_docs:,} docs / {n_vals:,} distinct values "
        f"| {num_bands}x{band_bits}-bit, {flips} probes "
        f"| max {stats['mx']} / p99 {stats['p99']} / "
        f"mean {stats['mean']:.2f} "
        f"| {int(stats['eq_collisions']):,} same-key value pairs "
        f"| {wall:.1f} s ({n_pairs:,} doc pairs) |"
    )


if __name__ == "__main__":
    main()
