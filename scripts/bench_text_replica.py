"""10x documents-replica scale check for the retrieval/LM/dedup wave.

Builds a 10x replica of sf0.1's documents table (doc_ids block-shifted,
texts replicated VERBATIM — the adversarial case for dedup operators:
every document has 9 exact twins), symlinks the other tables, and times
the text-heavy round-3 queries at 1x vs 10x. Linear-ish growth = the
operator's shuffle volume scales with the corpus, not with pair counts.

Usage: python scripts/bench_text_replica.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402

QUERIES = [
    "bm25_search",
    "phrase_search",
    "doc_surprisal",
    "duplicate_spans",
    "media_phash_pairs",
    "column_entropy",
]

TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()


def build_replica(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    blocks = [
        docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        for i in range(factor)
    ]
    rep = blocks[0]
    for b in blocks[1:]:
        rep = rep.unionByName(b)
    rep.write.mode("overwrite").parquet(str(out / "documents.parquet"))
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if not dst.exists():
            dst.symlink_to(f"{sf_dir}/{t}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    qs = entrymod.queries()
    out = {}
    for name in QUERIES:
        qs[name](spark, sf_dir).count()  # warm plan + cache
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rep_dir = f"/tmp/text_replica_{factor}x"
    spark = get_spark(app_name="bench-text-replica")
    build_replica(spark, sf_dir, rep_dir, factor)
    base = time_queries(spark, sf_dir)
    rep = time_queries(spark, rep_dir)
    print(f"{'query':28s} {'1x':>7s} {f'{factor}x':>7s} {'ratio':>6s}")
    for name in QUERIES:
        r = rep[name] / base[name] if base[name] else float("inf")
        print(f"{name:28s} {base[name]:7.2f} {rep[name]:7.2f} {r:6.2f}")


if __name__ == "__main__":
    main()
