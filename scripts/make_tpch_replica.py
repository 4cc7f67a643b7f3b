"""Consistent-key Nx replica generator: block-shift every key family
by i * (max_key + 1) per replica block i, so every FK join stays valid
and per-key cardinalities (orders per customer, lines per order, docs
per source...) are PRESERVED — scaling data volume without changing
the join selectivity or group fanout the planner sees. Payload columns
are replicated verbatim (the adversarial case for dedup operators:
every doc gains N-1 exact twins).

Usage: python scripts/make_tpch_replica.py N [src_dir] [out_dir]
Writes {out_dir}/{table}.parquet for every table in src_dir.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_spark_spark.session import get_spark  # noqa: E402

# key family -> columns carrying it, per table
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    # region / nation: tiny shared dims, copied verbatim (no key shift —
    # every replica block references the same nations, like real data)
    "region": [],
    "nation": [],
}

FAMILY = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "o_orderkey": "order",
    "l_orderkey": "order",
    "l_partkey": "part",
    "p_partkey": "part",
    "l_suppkey": "supp",
    "s_suppkey": "supp",
    "doc_id": "doc",
    "vec_id": "vec",
    "event_id": "event",
    "user_id": "user",
}


def replicate(df: DataFrame, cols: list[str], n: int,
              spans: dict[str, int]) -> DataFrame:
    if not cols or n == 1:
        return df
    rep = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(n).select(F.col("id").alias("__rep"))
        )
    )
    for c in cols:
        span = spans[FAMILY[c]]
        rep = rep.withColumn(
            c, (F.col(c) + F.col("__rep") * F.lit(span)).cast(df.schema[c].dataType)
        )
    return rep.drop("__rep")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/replica_{n}x"
    spark = get_spark(app_name="make-replica", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # span per key family = max key + 1 across the owning tables
    spans: dict[str, int] = {}
    for tbl, cols in SHIFT.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        for c in cols:
            fam = FAMILY[c]
            m = df.agg(F.max(F.col(c).cast("long"))).collect()[0][0] or 0
            spans[fam] = max(spans.get(fam, 0), int(m) + 1)
    print("spans:", spans)

    for tbl, cols in SHIFT.items():
        t0 = time.time()
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        rep = replicate(df, cols, n, spans)
        # keep file counts sane: ~32 output files for big facts
        rep.repartition(32 if cols else 1).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
        print(f"{tbl}: wrote {n if cols else 1}x in {time.time()-t0:.0f}s")
    print(f"replica at {out}")


if __name__ == "__main__":
    main()
