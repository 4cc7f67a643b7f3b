"""embedding queries split out of __spark_entry__.py (round 9) — see that module's docstring for the driver contract. Mechanically moved, text verbatim."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark_spark.functions.money import money_sum, money_sum_sql
from etl_spark_spark.functions.normalize import (
    _ACCENTS_DST,
    _ACCENTS_SRC,
    cnpj_normalize,
    etiqueta,
    strip_normalize,
    upper_trim,
)
from etl_spark_spark.functions.text import (
    LANG_PROFILES,
    bpe_token_count,
    bpe_token_count_sql,
    dup_fraction,
    fingerprint,
    lang_id,
    lang_scores,
    punct_count,
    quality_score,
    stopword_hits,
    token_count,
    tokens,
    word_shingles,
)
from etl_spark_spark.functions.scrub import scrub_pii, scrub_pii_sql_stages
from etl_spark_spark.operators.dedup import dedup_any, dedup_latest
from etl_spark_spark.operators.multimodal import (
    attach_media,
    extract_features,
    sample_frames,
)
from etl_spark_spark.operators.neardup import (
    contamination_scores,
    exact_dedup,
    near_dup_minhash,
    ngram_jaccard_pairs,
    prefix_filtered_jaccard_pairs,
    shingle_set,
    simhash,
    simhash_near_dup,
)
from etl_spark_spark.operators.fuzzy import fuzzy_join
from etl_spark_spark.operators.quality import (
    expectation_metrics,
    fk_violation_count,
    functional_dependencies,
)
from etl_spark_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    temperature_sample,
    stratified_hash_sample,
)
from etl_spark_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivf_pq,
    cosine_topk_lsh,
)
from etl_spark_spark.operators.reconcile import reconcile_full_outer
from etl_spark_spark.operators.graph import connected_components
from etl_spark_spark.operators.packing import pack_by_token_budget
from etl_spark_spark.operators.windows import partial_topk, top_k_per_group
from etl_spark_spark.functions.vectors import norm
from etl_spark_spark.pipelines.ressarcimento import allocation_pipeline
from etl_spark_spark.pipelines.superdesconto import best_sale_pipeline
from etl_spark_spark.sources import read_events, table, year_range_filter
from etl_spark_spark.streaming import sessionize_batch, sliding_agg, tumbling_agg

from ._shared import *  # noqa: F401,F403



def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-3 for query vectors vec_id < 10
    (broadcast queries; JVM-side fold — bit-identical to the SQL
    oracle's list_reduce)."""
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    )



def _ann_topk_check(
    approx: DataFrame,
    emb: DataFrame,
    k: int,
    min_recall: float,
    score_err_bound: float | None = None,
) -> DataFrame:
    """Driver-hashable derived check for an approximate top-k result:
    one row (n_results, scores_exact_ok, recall_ok) where every value
    is either SQL-derivable (n_results = k x |queries|) or an invariant
    the oracle asserts ``true``:

    - scores_exact_ok — every emitted (query, neighbor) pair's cos_sim
      is BIT-identical to the exact cosine recomputed from the raw
      vectors (the ANN path scores with the same deterministic kernel).
      With ``score_err_bound`` set (quantized-score paths: int8 SQ
      rerank), the invariant relaxes to max |cos_sim − exact| <=
      bound — quantized scores are approximate BY CONSTRUCTION, so the
      check pins the quantization error envelope instead (measured
      max 0.0021 on the fixture for int8; bound 0.01 leaves margin
      without tolerating a real scoring bug);
    - recall_ok — recall vs the exact top-k operator >= ``min_recall``
      (floors are calibrated to the random fixture; quality on
      clusterable data is pinned separately in tests).
    """
    from etl_spark_spark.functions.vectors import cosine

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=k)
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"))
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
    )
    # the approx/exact result sets are k x |queries| rows — broadcast
    # them so the corpus-side rescore joins never shuffle the corpus
    rescored = (
        F.broadcast(approx)
        .join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            cosine("__qv", "__cv").alias("__true_sim"),
        )
    )
    hits = approx.join(
        F.broadcast(exact.select("query_id", "neighbor_id")),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    if score_err_bound is None:
        score_ok = F.min(
            F.col("cos_sim").eqNullSafe(F.col("__true_sim"))
        )
    else:
        score_ok = F.max(
            F.abs(F.col("cos_sim") - F.col("__true_sim"))
        ) <= F.lit(float(score_err_bound))
    checked = rescored.agg(
        F.count("*").alias("n_results"),
        score_ok.alias("scores_exact_ok"),
    )
    recall = hits.agg(F.count("*").alias("__n_hit")).crossJoin(
        exact.agg(F.count("*").alias("__n_exact"))
    )
    return checked.crossJoin(recall).select(
        "n_results",
        "scores_exact_ok",
        (
            F.col("__n_hit").cast("double") / F.col("__n_exact")
            >= F.lit(min_recall)
        ).alias("recall_ok"),
    )



def q_emb_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate LSH top-3 (random-hyperplane buckets), reported as a
    driver-hashable derived check: the emitted scores must be
    bit-identical to the exact kernel and recall vs exact top-3 must
    clear the fixture floor (random vectors — LSH recall is pinned high
    on structured data in tests instead)."""
    emb = table(spark, sf_dir, "embeddings")
    approx = cosine_topk_lsh(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        dim=64, k=3,
    )
    return _ann_topk_check(approx, emb, k=3, min_recall=0.05)



def q_emb_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-3 (coarse quantizer + probed lists),
    reported as a driver-hashable derived check (see _ann_topk_check);
    clustered-data recall is pinned in tests."""
    emb = table(spark, sf_dir, "embeddings")
    approx = cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    )
    return _ann_topk_check(approx, emb, k=3, min_recall=0.2)



def q_emb_cosine_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-3: probed lists + asymmetric-distance
    scoring over int16 product-quantization codes, exact rerank of the
    ADC shortlist. Reported as a driver-hashable derived check — the
    exact rerank makes scores_exact_ok a hard invariant, and recall
    clears the fixture floor; planted-cluster recall is pinned in
    tests."""
    emb = table(spark, sf_dir, "embeddings")
    approx = cosine_topk_ivf_pq(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        dim=64,
        k=3,
        n_lists=8,
        n_probe=4,
        rerank=48,
    )
    return _ann_topk_check(approx, emb, k=3, min_recall=0.3)


def q_emb_cosine_topk_ivfpq_int8(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-PQ top-3 with the int8 scalar-quantized rerank
    (similarity.py:cosine_topk_ivf_pq rerank_int8=True — the shortlist
    fetch moves dim bytes + one scale per candidate instead of dim
    floats, ~4x less rerank shuffle at 100 TB). Scores are quantized
    BY CONSTRUCTION, so the check pins the error envelope
    (max |cos_sim − exact| <= 0.01; measured 0.0021) instead of
    bit-exactness; recall matches the float-rerank path at the gate
    scales (16/30 vs 16/30 at sf0.01 — the shortlist, not the rerank
    precision, binds). Closes the one item ROADMAP still named as
    future work (landed in commit 8ae1948 but previously
    pytest-only — now registry-exercised)."""
    emb = table(spark, sf_dir, "embeddings")
    approx = cosine_topk_ivf_pq(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        dim=64,
        k=3,
        n_lists=8,
        n_probe=4,
        rerank=48,
        rerank_int8=True,
    )
    return _ann_topk_check(
        approx, emb, k=3, min_recall=0.3, score_err_bound=0.01
    )



def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media plumbing: text bytes as payload, Arrow-batched
    mapInPandas feature extraction (deterministic fake decoder — real
    codecs are stubbed; the Spark-side schema/batching is the point).
    The feature vector is scalarized (feat_0..feat_7) so the comparator
    only sees hashable scalar columns; the oracle replays the fake
    decoder's byte-stride sums in SQL (documents are pure ASCII, so
    ascii(char) == byte value and char position == byte position)."""
    docs = table(spark, sf_dir, "documents")
    media = attach_media(docs, "doc_id", "text", "text/plain")
    feats = extract_features(media, fake=True)
    return feats.select(
        "id",
        "media_type",
        "n_bytes",
        "checksum",
        *[
            F.element_at(F.col("feat"), i + 1).alias(f"feat_{i}")
            for i in range(8)
        ],
    )



_MULTIMODAL_FEATURES_SQL = (
    "SELECT doc_id AS id, 'text/plain' AS media_type, "
    "strlen(text)::BIGINT AS n_bytes, md5(text) AS checksum, "
    + ", ".join(
        f"((coalesce(list_sum(list_transform(range({1 + i}, "
        "strlen(text)+1, 8), p -> ascii(text[p]))), 0) % 997)::DOUBLE "
        f"/ 997.0) AS feat_{i}"
        for i in range(8)
    )
    + " FROM documents"
)



def q_emb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as user surface: per-vector dim,
    positive-component count (F.filter) and L2 norm (fold)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        norm("embedding").alias("l2_norm"),
    )



def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs over
    pre-normalized vectors; threshold tuned to the fixture's cosine
    range so the result is non-empty)."""
    emb = table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4)



def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication of the embedding corpus:
    coarse-cluster the embedding space, drop the higher id of every
    within-cluster pair with cosine >= 0.35, return (vec_id, cluster)
    survivors. Uses the deterministic argmax-component clusterer so the
    whole pass (clustering included) is oracle-checkable; the trained
    spherical-k-means assignment is the production quality path, pinned
    by planted-cluster tests."""
    from etl_spark_spark.operators.similarity import (
        cluster_argmax,
        semantic_dedup,
    )

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "cluster", cluster_argmax("embedding")
    )
    return semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.35, cluster_col="cluster"
    )



def q_emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic approximate near-dup: LSH co-bucket candidates,
    exact (bit-identical) cosine verify — the scale path past the
    blocked all-pairs operator. Reported as a driver-hashable derived
    check: n_exact_pairs is value-matched against the oracle's own
    exact pair count, contained_ok asserts every emitted pair appears
    in the exact result with a bit-identical score, recall_ok floors
    recall at 0.5 (measured ~0.8 on the fixture)."""
    from etl_spark_spark.operators.similarity import cosine_near_dup_pairs_lsh

    emb = table(spark, sf_dir, "embeddings")
    approx = cosine_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", dim=64, threshold=0.4
    )
    exact = cosine_near_dup_pairs(emb, "vec_id", "embedding", 0.4)
    matched = approx.join(
        F.broadcast(exact.withColumnsRenamed({"cos_sim": "__exact_sim"})),
        ["id_a", "id_b"],
        "left",
    )
    checks = matched.agg(
        F.count("*").alias("__n_approx"),
        F.min(F.col("cos_sim").eqNullSafe(F.col("__exact_sim"))).alias(
            "contained_ok"
        ),
    )
    return (
        exact.agg(F.count("*").alias("n_exact_pairs"))
        .crossJoin(checks)
        .select(
            "n_exact_pairs",
            "contained_ok",
            (
                F.col("__n_approx").cast("double") / F.col("n_exact_pairs")
                >= F.lit(0.5)
            ).alias("recall_ok"),
        )
    )



def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over opaque media payloads — the 1-to-N
    mapInPandas row shape, hard-checked: the fake 'codec' strides the
    payload deterministically, and (documents being ASCII) the oracle
    reproduces the exact byte slices with VARCHAR substring + md5, so
    every frame hash must match bit-for-bit."""
    docs = table(spark, sf_dir, "documents")
    media = attach_media(docs, "doc_id", "text", "text/plain")
    frames = sample_frames(media, n_frames=4, frame_bytes=16)
    return frames.select(
        "id",
        "frame_no",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("long").alias("frame_len"),
    )



def q_emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (the class-prototype aggregation
    every embedding pipeline needs: cluster summaries, nearest-class
    classification, drift monitoring). Element-wise mean over
    array<float> per group via posexplode → (label, dim) partial sums →
    re-aggregate; two hash aggregates around one exchange, map-side
    partials do the heavy lifting. Sums accumulate in deterministic
    double order? No — but the compared output rounds to 6 decimals,
    and each (label, dim) cell sums <= |group| doubles whose partial
    order variation stays far below that rounding (pinned by the green
    oracle row). Output is one row per (label, dim) — fully scalar."""
    emb = table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    return (
        cells.groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid_val"),
            F.count("*").cast("long").alias("n_vectors"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("dim").cast("long").alias("dim"),
            "centroid_val",
            "n_vectors",
        )
    )



def q_emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (contrastive-training data prep): for each
    probe vector (vec_id < 10), the top-5 most cosine-similar vectors
    with a DIFFERENT label — near-miss negatives, the examples random
    sampling almost never surfaces. Broadcast probes, one corpus scan,
    label filter BEFORE the ranking window
    (operators/similarity.py:hard_negatives). Scores ride the shared
    left-to-right fold, so the oracle is bit-identical."""
    from etl_spark_spark.operators.similarity import hard_negatives

    emb = table(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        "label", k=5,
    )



def q_emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier sweep: the 3 members least
    cosine-similar to their own label's centroid — the mislabeled/
    garbage-vector pass before training on labeled embeddings.
    Centroids are per-dimension hash aggregates rounded to 6 decimals
    BEFORE any distance math (quantizing away float-sum order), then
    the member-centroid cosine runs the shared deterministic fold
    (operators/similarity.py:label_centroid_outliers)."""
    from etl_spark_spark.operators.similarity import label_centroid_outliers

    emb = table(spark, sf_dir, "embeddings")
    return label_centroid_outliers(emb, "vec_id", "embedding", "label", k=3)



_JL_OUT_DIM, _JL_IN_DIM = 16, 64


def q_emb_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss +-1 projection of the 64-dim embeddings
    to 16 exact int64 coordinates — the dimensionality-reduction step
    before cheap ANN/cluster passes. MAP-ONLY (zero shuffle, zero
    joins): each row folds its own array against sign literals derived
    from md5, so the oracle regenerates the identical matrix and the
    hash gate compares exact integers
    (operators/projection.py:jl_project)."""
    from etl_spark_spark.operators.projection import jl_project

    emb = table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return jl_project(
        emb, "vec_id", "embedding", out_dim=_JL_OUT_DIM, dim=_JL_IN_DIM
    )


def _jl_projection_oracle() -> str:
    from etl_spark_spark.operators.projection import jl_project_sql

    return jl_project_sql(
        "embeddings", "vec_id", "embedding", _JL_OUT_DIM, _JL_IN_DIM
    )


def q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance matrix of the embedding corpus — the
    sufficient-statistics pass before whitening/PCA/OPQ rotation
    training. Components are fixed-point-quantized once (micro), all
    sums integer-exact (decimal/HUGEINT), and each of the d(d+1)/2
    upper-triangle cells ends in ONE IEEE division on identical exact
    inputs — bit-stable under any partitioning, full value-hash
    oracle. Cell products are generated map-side from each row's
    array (no self-join) and combine into the constant-size cell
    table before any exchange. This exact d² struct-explode form is
    the EVAL/ORACLE path (the neardup_eval/sampled convention, round
    12): production covariance at transformer-scale d runs through
    q:emb_covariance_blocked (Arrow-batched matrix products, 0.39 s
    vs 6.1 s here at sf0.1, bit-identical output)
    (operators/stats.py:embedding_covariance)."""
    from etl_spark_spark.operators.stats import embedding_covariance

    emb = table(spark, sf_dir, "embeddings", columns=["embedding"])
    return embedding_covariance(emb, "embedding")



def q_emb_covariance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The covariance sufficient-statistics pass on the Arrow-blocked
    scale path for transformer-scale d: one int64 matrix product per
    Arrow batch inside mapInPandas emits d(d+1)/2 partial rows per
    batch (instead of exploding n·d²/2 structs), decimal accumulation
    on the Spark side keeps the same ≥10^12-row exactness bound, and
    quantization stays a Spark expression so the result is
    bit-identical to q:emb_covariance — both share one oracle
    (operators/stats.py:embedding_covariance_blocked)."""
    from etl_spark_spark.operators.stats import embedding_covariance_blocked

    emb = table(spark, sf_dir, "embeddings", columns=["embedding"])
    return embedding_covariance_blocked(emb, "embedding")



def q_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-dup detection for OPAQUE media
    payloads: simhash over strided byte windows of the binary (no
    tokenization, no codec) — the byte-level analog of image pHash
    dedup, usable on any attachment the engine can't decode. Reuses
    the banded simhash pair machinery; payloads here are the fake-
    codec text bytes (pure ASCII), which is what lets a SQL oracle
    replay the byte windows with substr."""
    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    media = attach_media(docs, "doc_id", "text", "text/plain")
    s = media.select(
        F.col("id"), F.col("media").cast("string").alias("__txt")
    ).filter(F.length("__txt") >= 8)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("__txt") - 7, F.lit(4)),
        lambda i: F.col("__txt").substr(i, F.lit(8)),
    )
    return simhash_near_dup(s, "id", grams, threshold=10)



def q_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation on the embedding table: for each of
    the 50 probe vectors, the 5 exact-cosine nearest neighbors vote on
    a label (majority, ties to the smallest label) and the prediction
    is scored against the probe's true label — the standard
    embedding-quality sanity check. Reuses the broadcast exact top-k
    path (corpus scanned once, never shuffled); votes collapse in one
    tiny aggregate."""
    from etl_spark_spark.operators.similarity import cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 50)
    nn = cosine_topk(emb, probes, "vec_id", "embedding", k=5)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    votes = (
        nn.join(lab, "neighbor_id")
        .groupBy("query_id", "n_label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.col("n_label")
    )
    pred = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("n_label").alias("pred_label"), "votes")
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
    "(acc, x) -> acc + x)"
)


_EMB_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id,
           {_DOT.format(a="qv", b="cv")}
           / nullif(sqrt({_DOT.format(a="qv", b="qv")})
                    * sqrt({_DOT.format(a="cv", b="cv")}), 0) AS cos_sim
    FROM c, q WHERE neighbor_id != query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
    ) AS rank
    FROM scored
) t WHERE rank <= 3
"""


_EMB_STATS_SQL = f"""
SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       sqrt({_DOT.format(a="embedding", b="embedding")}) AS l2_norm
FROM embeddings
"""


_UNIT = (
    "list_transform({v}, x -> CAST(x AS DOUBLE) / sqrt("
    + _DOT.format(a="{v}", b="{v}")
    + "))"
)


_EMB_NEAR_DUP_SQL = f"""
WITH u AS (
    SELECT vec_id, {_UNIT.format(v="embedding")} AS uv FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_DOT.format(a="a.uv", b="b.uv")} AS cos_sim
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE {_DOT.format(a="a.uv", b="b.uv")} >= 0.4
"""



"""Derived-check oracles for the approximate/sketch/model queries: the
Spark side computes the invariants (bit-exact scores, containment,
recall/error-bound floors, model-vs-weak-label agreement) against the
exact operators, and the oracle value-matches the SQL-derivable parts
(counts, weak labels) while asserting the invariant booleans true. This
turns the former rows-only checks into hard hash-matched verdicts."""

_ANN_TOPK_CHECK_SQL = """
SELECT CAST(3 * (SELECT count(*) FROM embeddings WHERE vec_id < 10) AS BIGINT)
           AS n_results,
       true AS scores_exact_ok,
       true AS recall_ok
"""


_EMB_NEAR_DUP_LSH_SQL = f"""
WITH u AS (
    SELECT vec_id, {_UNIT.format(v="embedding")} AS uv FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       true AS contained_ok,
       true AS recall_ok
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE {_DOT.format(a="a.uv", b="b.uv")} >= 0.4
"""


_SEMANTIC_DEDUP_SQL = f"""
WITH u AS (
    SELECT vec_id, {_UNIT.format(v="embedding")} AS uv,
           CAST(list_indexof(embedding, list_max(embedding)) AS BIGINT) AS cluster
    FROM embeddings
),
p AS (
    SELECT DISTINCT b.vec_id AS id_b
    FROM u a JOIN u b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {_DOT.format(a="a.uv", b="b.uv")} >= 0.35
)
SELECT vec_id, cluster FROM u WHERE vec_id NOT IN (SELECT id_b FROM p)
"""


_MULTIMODAL_FRAMES_SQL = """
WITH f AS (
  SELECT doc_id AS id, CAST(fn AS INT) AS frame_no,
         substring(text, CAST(fn AS INT) * greatest(length(text) // 4, 1) + 1, 16)
             AS frame
  FROM documents, range(4) r(fn)
)
SELECT id, frame_no, md5(frame) AS frame_md5,
       CAST(length(frame) AS BIGINT) AS frame_len
FROM f
"""



_EMB_LABEL_CENTROIDS_SQL = """
WITH cells AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim,
         unnest(embedding) AS x
  FROM embeddings
)
SELECT label::BIGINT AS label, dim::BIGINT AS dim,
       round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val,
       count(*)::BIGINT AS n_vectors
FROM cells
GROUP BY 1, 2
"""


_EMB_HARD_NEGATIVES_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding AS qv
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, label AS neighbor_label, embedding AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label,
         {_DOT.format(a="qv", b="cv")}
         / nullif(sqrt({_DOT.format(a="qv", b="qv")})
                  * sqrt({_DOT.format(a="cv", b="cv")}), 0) AS cos_sim
  FROM c, q WHERE neighbor_label != query_label
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim, rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rank
  FROM scored
) t WHERE rank <= 5
"""


_EMB_LABEL_OUTLIERS_SQL = f"""
WITH cells AS (
  SELECT label, unnest(range(len(embedding))) AS dim,
         unnest(embedding) AS x
  FROM embeddings
), cent_cells AS (
  SELECT label, dim, round(avg(CAST(x AS DOUBLE)), 6) AS c
  FROM cells GROUP BY 1, 2
), cent AS (
  SELECT label, array_agg(c ORDER BY dim) AS cent
  FROM cent_cells GROUP BY 1
), scored AS (
  SELECT e.label, e.vec_id,
         {_DOT.format(a="e.embedding", b="cent")}
         / nullif(sqrt({_DOT.format(a="e.embedding", b="e.embedding")})
                  * sqrt({_DOT.format(a="cent", b="cent")}), 0)
           AS cos_to_centroid
  FROM embeddings e JOIN cent USING (label)
)
SELECT label, vec_id, cos_to_centroid, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY label ORDER BY cos_to_centroid ASC NULLS LAST, vec_id
  ) AS rank
  FROM scored
) t WHERE rank <= 3
"""



def _emb_covariance_oracle() -> str:
    from etl_spark_spark.operators.stats import embedding_covariance_sql

    return embedding_covariance_sql("embeddings", "embedding")



_MEDIA_PHASH_PAIRS_SQL = f"""
WITH m AS (SELECT doc_id, text FROM documents WHERE strlen(text) >= 8),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, strlen(text) - 6, 4),
                               i -> substr(text, i, 8))) AS tk
  FROM m
),
h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM g),
s AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id),
sh AS (SELECT doc_id AS id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM s),
bands AS (
    SELECT id, simhash, b AS band,
           (simhash >> (15 * b)) & 32767 AS key
    FROM sh, unnest([0, 1, 2, 3]) AS u(b)
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 10
"""



_KNN_LABEL_ACCURACY_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS true_label
           FROM embeddings WHERE vec_id < 50),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
      FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, n_label,
           {_DOT.format(a="qv", b="cv")}
           / nullif(sqrt({_DOT.format(a="qv", b="qv")})
                    * sqrt({_DOT.format(a="cv", b="cv")}), 0) AS cos_sim
    FROM c, q WHERE neighbor_id != query_id
), nn AS (
    SELECT query_id, n_label FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
        ) AS rank
        FROM scored
    ) t WHERE rank <= 5
), votes AS (
    SELECT query_id, n_label, count(*) AS votes FROM nn GROUP BY 1, 2
), pred AS (
    SELECT query_id, n_label AS pred_label, CAST(votes AS BIGINT) AS votes
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY votes DESC, n_label
        ) AS rn
        FROM votes
    ) t WHERE rn = 1
)
SELECT p.query_id, q.true_label, p.pred_label, p.votes,
       p.pred_label = q.true_label AS correct
FROM pred p JOIN q ON q.query_id = p.query_id
"""


__all__ = [
    'q_emb_cosine_topk',
    '_ann_topk_check',
    'q_emb_cosine_topk_lsh',
    'q_emb_cosine_topk_ivf',
    'q_emb_cosine_topk_ivfpq',
    'q_emb_cosine_topk_ivfpq_int8',
    'q_multimodal_features',
    '_MULTIMODAL_FEATURES_SQL',
    'q_emb_stats',
    'q_emb_near_dup',
    'q_semantic_dedup',
    'q_emb_near_dup_lsh',
    'q_multimodal_frames',
    'q_emb_label_centroids',
    'q_emb_hard_negatives',
    'q_emb_label_outliers',
    'q_emb_covariance',
    'q_emb_jl_projection',
    '_jl_projection_oracle',
    'q_emb_covariance_blocked',
    'q_media_phash_pairs',
    'q_knn_label_accuracy',
    '_DOT',
    '_EMB_COSINE_SQL',
    '_EMB_STATS_SQL',
    '_UNIT',
    '_EMB_NEAR_DUP_SQL',
    '_ANN_TOPK_CHECK_SQL',
    '_EMB_NEAR_DUP_LSH_SQL',
    '_SEMANTIC_DEDUP_SQL',
    '_MULTIMODAL_FRAMES_SQL',
    '_EMB_LABEL_CENTROIDS_SQL',
    '_EMB_HARD_NEGATIVES_SQL',
    '_EMB_LABEL_OUTLIERS_SQL',
    '_emb_covariance_oracle',
    '_MEDIA_PHASH_PAIRS_SQL',
    '_KNN_LABEL_ACCURACY_SQL',
]
