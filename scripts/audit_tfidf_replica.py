"""Replica-scale audit for tfidf_topk_similar (round-10 operator).

Runs doc_tfidf_similar at 1x (sf0.1) and at the verbatim-twin replicas
built by scripts/bench_text_replica.py (/tmp/text_replica_{N}x),
reporting wall, output rows, and the rare-term candidate-pair count.

The twin replica is adversarial for PAIR dedup ops but degenerate for
rare-term blocking: replicating every doc N times multiplies every
term's df by N, so 1x-rare terms (df <= rare_df) cross the threshold
and candidates collapse — the documented recall contract (common-term
pairs are not candidates) surfacing as "twins of boilerplate are not
rare-term neighbors". The audit therefore ALSO runs a scaled rare_df
(rare_df * N) at the replica, which restores the 1x candidate
semantics per twin-block and is the honest stress case for the
posting self-join: each 1x posting of length p becomes length p*N,
so candidate pairs grow ~N^2 per rare term. Sub-quadratic wall there
= the distinct-collapse + narrow-verify design holding.

Usage: python scripts/audit_tfidf_replica.py [factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, rare_df: int) -> tuple[float, int, int]:
    from pyspark.sql import functions as F

    from etl_spark_spark.operators.retrieval import (
        tfidf_doc_vectors,
        tfidf_topk_similar,
    )
    from etl_spark_spark.sources import table

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf_topk_similar(docs, "doc_id", "text", k=3, rare_df=rare_df)
    out.count()  # warm
    t0 = time.time()
    n_out = out.count()
    wall = time.time() - t0
    w = tfidf_doc_vectors(docs, "doc_id", "text")
    rare = w.filter(F.col("__df") <= rare_df).select(
        F.col("doc_id").alias("d"), "term"
    )
    n_cand = (
        rare.alias("a")
        .join(rare.alias("b"), "term")
        .filter(F.col("a.d") < F.col("b.d"))
        .select("a.d", "b.d")
        .distinct()
        .count()
    )
    return wall, n_out, n_cand


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rep_dir = f"/tmp/text_replica_{factor}x"
    spark = get_spark(app_name="audit-tfidf-replica")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, "/root/testdata/sf0.1", rare_df=24)
    print(f"1x  rare_df=24 : wall {base[0]:6.2f} s, rows {base[1]}, "
          f"cand {base[2]}")
    if not os.path.exists(rep_dir):
        print(f"replica {rep_dir} missing: run scripts/bench_text_replica.py")
        return
    rep = run(spark, rep_dir, rare_df=24)
    print(f"{factor}x rare_df=24 : wall {rep[0]:6.2f} s, rows {rep[1]}, "
          f"cand {rep[2]} (twin dfs cross the threshold -> candidates "
          f"collapse by design)")
    rep_s = run(spark, rep_dir, rare_df=24 * factor)
    print(f"{factor}x rare_df={24 * factor}: wall {rep_s[0]:6.2f} s, "
          f"rows {rep_s[1]}, cand {rep_s[2]} (restored 1x semantics; "
          f"postings x{factor} -> pairs ~x{factor * factor} per term)")


if __name__ == "__main__":
    main()
