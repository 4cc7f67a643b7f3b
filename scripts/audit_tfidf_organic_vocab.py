"""Organic-vocabulary (Zipf/Heaps) recall audit for the TF-IDF
rare-shingle blocker (round-12, VERDICT r11 task 4).

The round-11 measurement proved an ABSOLUTE rare_df collapses on the
fixture's BOUNDED 31-word vocabulary (trigram space caps, dfs shift up
with corpus size, within-reachable recall 0.91 -> 0.006 at 10x). The
production guidance — "Heaps-law vocabulary growth keeps rare shingles
populated at every scale" — was an assertion. This script measures it:

1. Synthesizes an OPEN-VOCABULARY corpus: every token is an i.i.d.
   Zipf(a) draw over an unbounded integer vocabulary (Heaps' law
   V(n) ~ n^beta emerges from Zipf sampling), deterministic seed.
2. Plants known near-duplicate pairs (each duplicate re-draws ~10% of
   its source's token positions), the ground truth a blocker must
   recover; truth membership is confirmed by the EXACT full-corpus
   TF-IDF cosine of each planted pair (the operator's own scoring),
   thresholded at cos_milli >= 800 — identical to the fixture audit.
3. Measures, at 1x and 10x, for the shipped ABSOLUTE threshold
   (rare_df=4) and the round-12 CORPUS-RELATIVE one
   (rare_df_frac=0.002, which resolves to df<=4 at 1x — same cut):
   planted-pair recall through the SHIPPED tfidf_block_candidates
   generator, total candidate pairs, candidates/doc, and vocabulary/
   shingle-df shape evidence (distinct unigrams, distinct trigrams,
   median trigram df) showing the corpus actually Heaps-grows.

Usage: python scripts/audit_tfidf_organic_vocab.py [n_docs_1x]
(default 2000; 10x = 20000 docs, ~100 tokens each)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark_spark.session import get_spark  # noqa: E402

SEED = 20260816
ZIPF_A = 1.4
SIM_MILLI = 800
PLANT_FRAC = 0.05
MUTATE_P = 0.10


def synth(n_docs: int):
    """(doc_id, text) rows + planted (da, db) pairs; deterministic."""
    rng = np.random.RandomState(SEED)
    docs, planted = [], []
    n_plant = int(n_docs * PLANT_FRAC)
    for i in range(n_docs):
        length = 60 + (i % 40)
        toks = rng.zipf(ZIPF_A, size=length)
        docs.append((i, " ".join(f"w{t}" for t in toks)))
        if i < n_plant:
            mut = toks.copy()
            flip = rng.random_sample(length) < MUTATE_P
            mut[flip] = rng.zipf(ZIPF_A, size=int(flip.sum()))
            dup_id = n_docs + i
            docs.append((dup_id, " ".join(f"w{t}" for t in mut)))
            planted.append((i, dup_id))
    return docs, planted


def measure(spark, docs_rows, planted, label: str):
    from pyspark.sql import functions as F

    from etl_spark_spark.functions.text import tokens
    from etl_spark_spark.operators.retrieval import (
        tfidf_block_candidates,
        tfidf_doc_vectors,
    )

    docs = spark.createDataFrame(
        docs_rows, "doc_id long, text string"
    ).localCheckpoint()
    n = docs.count()
    pairs = spark.createDataFrame(planted, "da long, db long")

    # corpus shape: does it actually Heaps-grow?
    tok = docs.select(F.explode(tokens("text")).alias("t"))
    v_uni = tok.select("t").distinct().count()
    sh = docs.select(
        F.col("doc_id").alias("d"), tokens("text").alias("tk")
    ).select(
        "d",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - F.lit(2)),
                lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, F.lit(3))),
            )
        ).alias("g"),
    ).distinct()
    gdf = sh.groupBy("g").agg(F.count("*").alias("df"))
    v_tri = gdf.count()
    med_df = gdf.agg(
        F.expr("percentile_approx(df, 0.5, 10000)").alias("m")
    ).collect()[0]["m"]

    # exact TF-IDF cosine of every planted pair (full-corpus weights)
    w = tfidf_doc_vectors(docs, "doc_id", "text").localCheckpoint()
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    wa = w.select(F.col("doc_id").alias("da"), "term", F.col("w").alias("wa"))
    wb = w.select(F.col("doc_id").alias("db"), "term", F.col("w").alias("wb"))
    dots = (
        F.broadcast(pairs).join(wa, "da").join(wb, ["db", "term"])
        .groupBy("da", "db").agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = (
        dots.join(norms.select(F.col("doc_id").alias("da"),
                               F.col("n2").alias("na")), "da")
        .join(norms.select(F.col("doc_id").alias("db"),
                           F.col("n2").alias("nb")), "db")
        .select(
            "da", "db",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
                * 1000.0
            ).cast("long").alias("cos_milli"),
        )
    )
    truth = cos.filter(F.col("cos_milli") >= SIM_MILLI).localCheckpoint()
    n_truth = truth.count()

    out = {"label": label, "n_docs": n, "v_unigram": v_uni,
           "v_trigram": v_tri, "med_tri_df": med_df,
           "n_planted": len(planted), "n_truth": n_truth}
    for thr_label, kw in (
        ("abs rare_df=4", dict(rare_df=4)),
        ("frac 0.002", dict(rare_df=None, rare_df_frac=0.002)),
    ):
        t0 = time.time()
        cand = tfidf_block_candidates(
            docs, "doc_id", "text", block_ngram=3, **kw
        ).localCheckpoint()
        n_cand = cand.count()
        wall = time.time() - t0
        hit = truth.join(
            cand,
            (truth["da"] == cand["__da"]) & (truth["db"] == cand["__db"]),
        ).count()
        out[thr_label] = {
            "n_cand": n_cand,
            "cand_per_doc": round(n_cand / n, 2),
            "recall": round(hit / n_truth, 3) if n_truth else None,
            "wall_s": round(wall, 2),
        }
    return out


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark(app_name="audit-tfidf-organic-vocab")
    spark.sparkContext.setLogLevel("ERROR")
    for scale, n in (("1x", n1), ("10x", n1 * 10)):
        rows, planted = synth(n)
        res = measure(spark, rows, planted, scale)
        print(res, flush=True)


if __name__ == "__main__":
    main()
