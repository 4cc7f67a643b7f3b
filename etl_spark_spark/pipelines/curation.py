"""Training-data curation pipeline — the end-to-end document pass an
LLM data pipeline runs before tokenization, composed entirely from this
engine's primitives so every stage inherits their scale shapes:

1. quality gate     — expression-side scoring (codegen, map-only)
2. exact dedup      — fingerprint hash-aggregate, keep min id
3. near-dup removal — n-gram Jaccard pairs among survivors, drop the
                      higher id of each pair (deterministic greedy:
                      pair emission is id_a < id_b, so the kept doc of
                      any cluster is its minimum surviving id's
                      transitive frontier)

The exact all-pairs Jaccard stage is the bounded-corpus ground truth;
swap in ``near_dup_minhash`` (same pair schema) for the banded LSH
scale path — the surrounding pipeline is unchanged. The whole pass is
three shuffles beyond the pair stage: fingerprint agg, pair distinct,
and the final left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_PROFILES,
    fingerprint,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
from ..operators.neardup import ngram_jaccard_pairs


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.15,
    min_tokens: int = 20,
    max_tokens: int = 10_000,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Run the full curation pass; returns the curated corpus as
    (id, lang, n_tokens, quality) with deterministic contents."""
    stats = docs.select(
        F.col(id_col),
        F.col("lang"),
        F.col(text_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        quality_score(text_col, LANG_PROFILES["en"]).alias("quality"),
    )
    kept = stats.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    )
    # exact dedup: survivors whose id is the minimum of their fingerprint
    fp = kept.withColumn("__fp", fingerprint(text_col))
    canon = (
        fp.join(
            fp.groupBy("__fp").agg(F.min(id_col).alias("__keep")),
            "__fp",
        )
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__fp", "__keep")
    )
    # near-dup removal among survivors: drop the higher id of each pair
    toks = canon.select(F.col(id_col), tokens(text_col).alias("__t"))
    pairs = ngram_jaccard_pairs(
        toks, id_col, word_shingles("__t", 3), threshold=jaccard_threshold
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (
        canon.join(drop, id_col, "left_anti")
        .select(id_col, "lang", "n_tokens", "quality")
    )
