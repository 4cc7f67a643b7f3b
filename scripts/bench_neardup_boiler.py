"""Adversarial NEAR-identical skew replica for banded neardup
(verdict-r7 task 3): a corpus-scale cluster of 1-token-edit
boilerplate docs. Verbatim-twin collapse cannot merge them (their
shingle sets are all DISTINCT), but their MinHash signatures are
near-identical, so the whole cluster lands in the same band buckets
and the within-bucket self-join goes quadratic: T members -> ~T^2/2
candidate pairs per band.

Measures, at growing family sizes T:

- band-bucket size distribution (the skew itself);
- ANALYTIC candidate volume, uncapped vs bucket_cap star mitigation
  (sum m(m-1)/2 vs m-1 over buckets) — computed from bucket sizes so
  the quadratic configuration can be quantified without running it;
- measured wall of the full verify pipeline (near_dup_minhash
  count()), capped always, uncapped only while its analytic candidate
  volume stays under a guard (beyond it the uncapped run is the DNF
  this replica exists to demonstrate).

Results print as markdown rows for BASELINE.md.

Usage: python scripts/bench_neardup_boiler.py [T ...]
       (default family sizes: 1000 4000 16000 50000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_spark_spark.functions.text import tokens, word_shingles  # noqa: E402
from etl_spark_spark.operators.neardup import (  # noqa: E402
    collapse_identical_sets,
    lsh_candidate_pairs,
    minhash_signature,
    near_dup_minhash,
    shingle_set,
)
from etl_spark_spark.session import get_spark  # noqa: E402

CAP = 64
UNCAPPED_GUARD = 30_000_000  # analytic candidates beyond this: skip the run
BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu amber birch cedar dune "
    "ember fjord grove heath iris jade krill lotus maple nectar onyx "
    "pearl quartz reef slate tundra umber vale willow xenon yarrow zeal "
    "arc bay cove dell elm fen gale hill isle knoll"
)


STOP_PREFIX = "the and of to in a is that it was for on with as by"


def corpus(spark, sf_dir: str, family: int, quality_pass: bool = False):
    """sf documents + a family of 1-token-edit boilerplate docs.

    ``quality_pass=True`` prefixes every family doc with a fixed run of
    English stopwords so the family SURVIVES curate_documents' quality
    gate (stopword-ratio score) — required for the composite row, which
    must exercise the capped near-dup stage, not watch the quality
    filter delete the adversary. The prefix is identical across the
    family, so the near-identical-signature skew is unchanged."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    n_base = len(BASE.split())
    body = F.concat_ws(
        " ",
        *[
            F.when(
                F.lit(i) == (F.col("id") % n_base),
                F.concat(F.lit("edit"), F.col("id").cast("string")),
            ).otherwise(F.lit(w))
            for i, w in enumerate(BASE.split())
        ],
    )
    if quality_pass:
        body = F.concat(F.lit(STOP_PREFIX + " "), body)
    fam = spark.range(family).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit("en").alias("lang"),
        body.alias("text"),
    )
    return docs.unionByName(fam)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 4000, 16000, 50000]
    spark = get_spark(
        app_name="bench-neardup-boiler", cpus=32, shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"

    print("| T | top bucket | cand uncapped (analytic) | cand capped | "
          "wall uncapped | wall capped |")
    print("|---|---|---|---|---|---|")
    for T in sizes:
        docs = corpus(spark, sf_dir, T)
        toks = docs.select("doc_id", tokens("text").alias("t"))
        sh = shingle_set(toks, "doc_id", word_shingles("t", 3))
        reps_sh, _members = collapse_identical_sets(sh, "doc_id")
        sig = minhash_signature(reps_sh, "doc_id", 8).localCheckpoint()

        # bucket-size distribution -> analytic candidate volumes
        bands = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "#", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                ).alias("key"),
            )
            for b in range(4)
        ]
        bsizes = (
            sig.select(F.explode(F.array(*bands)).alias("bk"))
            .groupBy("bk.band", "bk.key")
            .count()
        )
        stats = bsizes.agg(
            F.max("count").alias("mx"),
            F.sum(F.expr("count * (count - 1) / 2")).alias("unc"),
            F.sum(
                F.when(
                    F.col("count") > CAP, F.col("count") - 1
                ).otherwise(F.expr("count * (count - 1) / 2"))
            ).alias("cap"),
        ).collect()[0]

        def wall(bucket_cap):
            t0 = time.time()
            n = near_dup_minhash(
                toks, "doc_id", word_shingles("t", 3),
                num_perms=8, rows_per_band=2, threshold=0.5,
                bucket_cap=bucket_cap,
            ).count()
            return time.time() - t0, n

        wc, nc = wall(CAP)
        if stats["unc"] <= UNCAPPED_GUARD:
            wu, nu = wall(None)
            wu_s = f"{wu:.1f} s ({nu} pairs)"
        else:
            wu_s = f"SKIPPED (guard: {int(stats['unc']):,} candidates)"
        # sanity: the star path must still connect the family
        print(
            f"| {T} | {stats['mx']} | {int(stats['unc']):,} "
            f"| {int(stats['cap']):,} | {wu_s} | {wc:.1f} s ({nc} pairs) |",
            flush=True,
        )

    # The production COMPOSITE under the same adversary: the full
    # curate_documents pass (quality gate -> exact dedup -> near-dup
    # removal) on its minhash scale path with bucket_cap engaged —
    # round-9 wiring; the family is stopword-prefixed so it survives
    # the quality gate and actually reaches the capped pair stage.
    # Uncapped, the pair stage inside the composite is the same
    # analytic T^2/2 blowup the first table quantifies.
    from etl_spark_spark.pipelines.curation import curate_documents

    print()
    print("| T | composite capped wall | curated rows |")
    print("|---|---|---|")
    for T in sizes:
        docs = corpus(spark, sf_dir, T, quality_pass=True)
        t0 = time.time()
        n = curate_documents(
            docs, pair_stage="minhash", bucket_cap=CAP
        ).count()
        print(f"| {T} | {time.time() - t0:.1f} s | {n} |", flush=True)


if __name__ == "__main__":
    main()
