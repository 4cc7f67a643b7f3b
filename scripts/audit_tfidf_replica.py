"""Replica-scale audit for tfidf_topk_similar (round-10 operator).

Two replica regimes, because they stress different things:

- TWIN (verbatim copies, scripts/bench_text_replica.py): every
  trigram's df multiplies by N, so 1x-rare shingles cross the fixed
  rare_df threshold and candidates COLLAPSE BY DESIGN — verbatim twins
  are exact-dedup's job (the production order runs exact dedup first),
  not rare-shingle similarity's. Scaling rare_df by N to "restore"
  semantics is quadratic by construction on twins (each 1x pair
  becomes N^2 pairs): measured as a DNF and documented, not shipped.
- ORGANIC (this script builds it): every block suffixes each token
  with its block id, so blocks are fully distinct corpora — dfs and
  posting lengths stay 1x-shaped while the corpus grows Nx. Candidate
  pairs and wall should scale ~linearly; that is the 100 TB growth
  case.

Usage: python scripts/audit_tfidf_replica.py [factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, rare_df: int) -> tuple[float, int, int]:
    from etl_spark_spark.operators.retrieval import tfidf_topk_similar
    from etl_spark_spark.sources import table

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf_topk_similar(docs, "doc_id", "text", k=3, rare_df=rare_df)
    out.count()  # warm
    t0 = time.time()
    n_out = out.count()
    wall = time.time() - t0
    # candidate count from THE operator's own generator (shared
    # helper, so the audit cannot drift from the shipped blocking)
    from etl_spark_spark.operators.retrieval import tfidf_block_candidates

    n_cand = tfidf_block_candidates(
        docs, "doc_id", "text", rare_df=rare_df
    ).count()
    return wall, n_out, n_cand


def build_organic(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    """Nx corpus where block i suffixes every token with _b{i}: fully
    distinct blocks, 1x-shaped dfs/postings, Nx rows."""
    from pathlib import Path

    from pyspark.sql import functions as F

    out = Path(out_dir)
    if (out / "documents.parquet").exists():
        return
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    blocks = [
        docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit(f"_b{i}")),
                ),
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        for i in range(factor)
    ]
    rep = blocks[0]
    for b in blocks[1:]:
        rep = rep.unionByName(b)
    rep.write.mode("overwrite").parquet(str(out / "documents.parquet"))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    twin_dir = f"/tmp/text_replica_{factor}x"
    org_dir = f"/tmp/text_organic_{factor}x"
    spark = get_spark(app_name="audit-tfidf-replica")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, "/root/testdata/sf0.1", rare_df=4)
    print(f"1x  rare_df=4 : wall {base[0]:6.2f} s, rows {base[1]}, "
          f"cand {base[2]}", flush=True)
    if os.path.exists(twin_dir):
        rep = run(spark, twin_dir, rare_df=4)
        print(f"{factor}x TWIN rare_df=4 : wall {rep[0]:6.2f} s, "
              f"rows {rep[1]}, cand {rep[2]} (twin dfs cross the "
              f"threshold -> candidates collapse by design)", flush=True)
    build_organic(spark, "/root/testdata/sf0.1", org_dir, factor)
    org = run(spark, org_dir, rare_df=4)
    print(f"{factor}x ORGANIC rare_df=4: wall {org[0]:6.2f} s, "
          f"rows {org[1]}, cand {org[2]} "
          f"(1x-shaped postings, ~linear target)", flush=True)


if __name__ == "__main__":
    main()
