"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composite (the reference's
superdesconto shape: union -> window top-1 -> broadcast joins) at
sf0.001. ``queries()`` exposes one named query per implemented operator
family from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for each. Column names/aliases match pairwise; money sums use
integer-cents fixed-point (etl_spark_spark.functions.money) so values
are bit-identical regardless of execution order/parallelism.
"""

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

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return best_sale_pipeline(spark, SF_SMOKE)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped sums/averages with computed measures
    (SURVEY.md A1-A4; reference utils_ressarcimento.py:114-126)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            (money_sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (money_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_dedup_latest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-latest dedup (fixes SURVEY.md §4 hazard 1;
    reference's intent at utils_ressarcimento.py:54-55,145-146)."""
    li = table(spark, sf_dir, "lineitem")
    latest = dedup_latest(
        li,
        keys=["l_partkey"],
        order_by=[
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
        ],
    )
    return latest.select(
        "l_partkey",
        F.col("l_shipdate").cast("date").cast("string").alias("last_ship_date"),
        F.col("l_orderkey").alias("last_orderkey"),
        F.col("l_extendedprice").alias("last_price"),
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (W1 generalized to k=3)."""
    orders = table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        rank_col="rank_in_cust",
        keep_rank=True,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J6; reference utils_ressarcimento.py:260,266):
    customers with no orders in 1995 (scoped to a year so the result is
    non-trivially non-empty at every sf)."""
    customer = table(spark, sf_dir, "customer")
    orders = year_range_filter(
        table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"]),
        "o_orderdate",
        1995,
    )
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


def q_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + coalesce null-default + IN-list and NOT NULL filters
    (J5, F5, P11, P12)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    return (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").isNotNull())
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce(F.col("c_name"), F.lit("UNKNOWN")).alias("cust_name"),
            # ifnull ≡ coalesce/2 — both null-default forms the reference
            # uses (F5 at utils_superdesconto.py:110-112, F7 at
            # utils_ressarcimento.py:251) are part of the surface
            F.ifnull(F.col("c_mktsegment"), F.lit("NONE")).alias("segment"),
            "o_totalprice",
        )
    )


def q_normalize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-builder normalization library (F1-F4), never UDFs.
    Reads with an explicit StructType (S3: schema as a projection/type
    contract — skips footer inference, reads only declared columns;
    reference utils_ressarcimento.py:33-41)."""
    schema = T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
        ]
    )
    part = table(spark, sf_dir, "part", schema=schema)
    return part.select(
        "p_partkey",
        etiqueta("p_partkey").alias("etiqueta"),
        strip_normalize("p_name").alias("nome_norm"),
        cnpj_normalize("p_type").alias("tipo_norm"),
        upper_trim("p_brand").alias("marca_norm"),
    )


def q_monthly_orders_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year filter rewritten as a pushdown-friendly range predicate
    (SURVEY.md §4) + date_trunc month rollup (F10/F11, A1)."""
    orders = table(spark, sf_dir, "orders")
    return (
        year_range_filter(orders, "o_orderdate", 1995)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("mes")
        )
        .agg(
            money_sum("o_totalprice").alias("total_mes"),
            F.count("*").alias("num_pedidos"),
        )
    )


def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props extraction + IN-list filter + grouped sums over the
    incremental-feed analog (extension surface, SURVEY.md §7)."""
    events = read_events(spark, sf_dir, with_ts=False)
    return (
        events.filter(F.col("event_type").isin("click", "view", "purchase"))
        .filter(F.col("props").isNotNull())
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            money_sum("value").alias("sum_value"),
        )
    )


# ---- extension operators: text analysis / dedup / similarity / events ----


def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/punctuation/stopword counting + quality scoring (extension:
    text analysis over documents)."""
    docs = table(spark, sf_dir, "documents")
    # counters cast to long: aligns pandas dtype with DuckDB's
    # BIGINT-typed len()/count so the driver's value-hash sees
    # identical representations
    return docs.select(
        "doc_id",
        "lang",
        token_count("text").cast("long").alias("n_tokens"),
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        punct_count("text").cast("long").alias("n_punct"),
        stopword_hits("text", LANG_PROFILES["en"]).cast("long").alias("n_stop_en"),
        quality_score("text", LANG_PROFILES["en"]).alias("quality"),
    )


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID with deterministic argmax priority."""
    docs = table(spark, sf_dir, "documents")
    scores = lang_scores("text")
    return docs.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_PROFILES],
        lang_id("text").alias("pred_lang"),
    )


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text fingerprint (hash groupBy)."""
    docs = table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


def q_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands x 2) candidate pairs, exact-Jaccard
    verified at >= 0.5."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return near_dup_minhash(
        toks, "doc_id", word_shingles("t", 3), num_perms=8,
        rows_per_band=2, threshold=0.5,
    )


def q_neardup_bucket_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup pairs under the heavy-bucket STAR
    mitigation (bucket_cap=2): band buckets larger than the cap emit
    hub->member candidates instead of all pairs, bounding the
    quadratic blowup a near-identical boilerplate cluster causes (its
    1-token-edit members have DISTINCT shingle sets — verbatim-twin
    collapse cannot merge them — yet near-identical signatures put
    them all in one bucket; measured in scripts/bench_neardup_boiler.py
    and BASELINE.md round-8). The cap of 2 forces the star path on
    this corpus's natural size-3 buckets, so the driver gate exercises
    the mitigation, not just the passthrough. The oracle replays the
    complete pipeline in SQL: identical-set collapse, banding, bucket
    sizing + hub via window functions, capped candidate generation,
    exact-Jaccard verify, and pair re-expansion."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return near_dup_minhash(
        toks, "doc_id", word_shingles("t", 3), num_perms=8,
        rows_per_band=2, threshold=0.5, bucket_cap=2,
    )


def q_neardup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth all-pairs 3-gram Jaccard at >= 0.8."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return ngram_jaccard_pairs(toks, "doc_id", word_shingles("t", 3), threshold=0.8)


def q_neardup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard pairs at >= 0.7 via AllPairs/PPJoin prefix
    filtering — identical result to the brute-force shingle join, but
    candidates come only from each doc's rarest
    ``n - ceil(t*n) + 1`` shingles plus a size-ratio filter, so the
    frequent-shingle quadratic blowup never happens. The scalable
    exact path (LSH is the approximate one)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return prefix_filtered_jaccard_pairs(
        toks, "doc_id", word_shingles("t", 3), threshold=0.7
    )


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (single aggregate, no explosion per
    bit)."""
    docs = table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", tokens("text"))


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-3 for query vectors vec_id < 10
    (broadcast queries; JVM-side fold — bit-identical to the SQL
    oracle's list_reduce)."""
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    )


def _ann_topk_check(
    approx: DataFrame, emb: DataFrame, k: int, min_recall: float
) -> DataFrame:
    """Driver-hashable derived check for an approximate top-k result:
    one row (n_results, scores_exact_ok, recall_ok) where every value
    is either SQL-derivable (n_results = k x |queries|) or an invariant
    the oracle asserts ``true``:

    - scores_exact_ok — every emitted (query, neighbor) pair's cos_sim
      is BIT-identical to the exact cosine recomputed from the raw
      vectors (the ANN path scores with the same deterministic kernel);
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
    checked = rescored.agg(
        F.count("*").alias("n_results"),
        F.min(F.col("cos_sim").eqNullSafe(F.col("__true_sim"))).alias(
            "scores_exact_ok"
        ),
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


def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user OLS trend of event value
    over time, via EXACT integer sufficient statistics (decimal sums +
    fixed IEEE op sequence), bit-identical to the HUGEINT SQL
    formulation in the oracle independent of partitioning/row order.
    Runs the expression-only variant — one hash aggregate, zero Python
    workers (the applyInPandas twin ``fit_group_trend_exact`` computes
    the same bits and covers unbounded group sizes; float-tolerance
    agreement with DuckDB's native regr_slope is pinned in tests).
    x is epoch-millis to respect the decimal(38) range contract."""
    from etl_spark_spark.operators.grouped import fit_group_trend_exact_sql

    events = read_events(spark, sf_dir)
    ev = events.select(
        "user_id",
        # integer DIV, not /1000.0: double division then cast is lossy
        # in the 2^50 range
        F.expr("unix_micros(ts) DIV 1000").alias("x"),
        F.col("value").alias("y"),
    )
    return fit_group_trend_exact_sql(ev, ["user_id"], "x", "y")


_USER_VALUE_TREND_SQL = """
WITH e AS (
  SELECT user_id,
         epoch_ms(ts)::HUGEINT AS x,
         CAST(round(value * 100) AS HUGEINT) AS yc
  FROM events
), s AS (
  SELECT user_id, count(*)::HUGEINT AS n,
         sum(x) AS sx, sum(yc) AS sy,
         sum(x * x) AS sxx, sum(x * yc) AS sxy
  FROM e GROUP BY user_id
), d AS (
  -- int -> double via VARCHAR: DuckDB's direct HUGEINT->DOUBLE cast
  -- rounds the two 64-bit halves separately (not correctly rounded);
  -- strtod IS correctly rounded, matching Python's float(int)
  SELECT user_id, n::BIGINT AS n,
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS numd,
         CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS dend,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
         n * sxx - sx * sx = 0 AS degen
  FROM s
)
SELECT user_id, n,
  CASE WHEN degen THEN NULL
       ELSE numd / dend / 100.0 END AS slope,
  CASE WHEN degen THEN NULL
       ELSE syd / 100.0 / n::DOUBLE
            - (numd / dend / 100.0) * (sxd / n::DOUBLE) END AS intercept
FROM d
"""


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


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming
    op; same transformation runs on readStream)."""
    events = read_events(spark, sf_dir)
    return tumbling_agg(
        events,
        "ts",
        "1 hour",
        [F.col("event_type")],
        [
            F.count("*").alias("n_events"),
            money_sum("value").alias("sum_value"),
        ],
    ).select("window_start", "event_type", "n_events", "sum_value")


def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: hour grain aggregated
    from raw, day grain derived from the hourly aggregate (single raw
    scan; exact via integer cents)."""
    from etl_spark_spark.streaming.windows import time_rollup_counts

    events = read_events(spark, sf_dir)
    return time_rollup_counts(
        events,
        "ts",
        ["event_type"],
        F.round(F.col("value") * 100).cast("long"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (5-min gap) per user: session summary."""
    events = read_events(spark, sf_dir)
    s = sessionize_batch(events, "ts", ["user_id"], gap_seconds=300)
    return s.groupBy("user_id", "session_id").agg(
        F.min(F.unix_micros(F.col("ts"))).alias("session_start_us"),
        F.count("*").alias("n_events"),
        money_sum("value").alias("sum_value"),
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


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter on both sides of the date,
    grouped revenue, global top-10 (TakeOrdered)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    customer = table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(money_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join through the region/nation hierarchy
    with the local-supplier condition (customer and supplier in the
    same nation), grouped revenue per nation. Dimensions broadcast;
    the two fact tables join on their keys."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        year_range_filter(orders, "o_orderdate", 1996)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(money_sum(revenue).alias("revenue"), F.count("*").alias("n_items"))
    )


def q_error_context_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join (the scalable range-join pattern: coarse
    time-bin equi-join + exact refine, not an inequality nested loop):
    each error event matched to the same user's views within ±10 min."""
    from etl_spark_spark.operators.ranges import point_in_interval_join

    ev = read_events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        (F.unix_micros(F.col("ts")) - 600_000_000).alias("w_start"),
        (F.unix_micros(F.col("ts")) + 600_000_000).alias("w_end"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_micros(F.col("ts")).alias("view_us"),
    )
    pairs = point_in_interval_join(
        errors, views, ["user_id"], "w_start", "w_end", "view_us"
    )
    return pairs.groupBy("user_id", "error_id").agg(
        F.count("*").alias("n_context_views"),
        F.min("view_id").alias("first_view_id"),
    )


def q_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the constant-memory scale path for distinct
    counts and quantiles (HLL++ and GK-quantile; both partial-merge
    aggregates). Sketch outputs are engine-specific, so the query emits
    a driver-hashable derived check per group: the exact row count
    (value-matched by the oracle) plus booleans asserting each sketch
    landed within its published error bound of the exact aggregate
    computed alongside (HLL++ default rsd 5% -> 15% = 3 sigma; GK p50
    within 5% of the exact median)."""
    li = table(spark, sf_dir, "lineitem")
    # sketches and exact references aggregate SEPARATELY, then join the
    # few-row results: a count_distinct in the same groupBy would force
    # an Expand duplicating every input row through the percentile
    # buffers too (measured 0.5 s -> 8 s warm at sf0.1 combined)
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("__approx_parts"),
        F.approx_percentile("l_extendedprice", 0.5).alias("__approx_p50"),
        F.count("*").alias("n_rows"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("__exact_parts"),
        F.percentile("l_extendedprice", 0.5).alias("__exact_p50"),
    )
    return sketches.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        (
            F.abs(F.col("__approx_parts") - F.col("__exact_parts"))
            <= 0.15 * F.col("__exact_parts")
        ).alias("distinct_ok"),
        (
            F.abs(F.col("__approx_p50") - F.col("__exact_p50"))
            <= 0.05 * F.col("__exact_p50")
        ).alias("p50_ok"),
    )


def q_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each purchase matched to the same user's
    most recent click at or before it. Spark lacks a native as-of join;
    ours is the union+window formulation (one shuffle) — the oracle is
    DuckDB's native ASOF LEFT JOIN, so the operator's semantics are
    pinned against a reference implementation."""
    from etl_spark_spark.operators.asof import asof_join

    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("purchase_us"),
        F.col("event_id").alias("purchase_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("click_us"),
        F.col("event_id").alias("click_id"),
    )
    return asof_join(
        purchases.withColumn("__ts", F.col("purchase_us")),
        clicks.withColumn("__ts2", F.col("click_us")),
        by=["user_id"],
        left_ts="__ts",
        right_ts="__ts2",
        payload=["click_id", "click_us"],
        # click_id/click_us derive from never-NULL event columns ->
        # the cheaper per-column carry is exactly equivalent here
        payload_non_null=True,
    ).select("user_id", "purchase_id", "purchase_us", "click_id", "click_us")


def q_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pair detection: band the 60-bit simhash into
    4x15-bit keys, join docs sharing any band, verify hamming distance
    <= 10 with bit_count(xor). Banded detection guarantees recall only
    for distance <= 3 (pigeonhole); the oracle implements the identical
    banded algorithm so results match by construction."""
    docs = table(spark, sf_dir, "documents")
    return simhash_near_dup(docs, "doc_id", tokens("text"), threshold=10)


def q_neardup_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup under the GUARANTEED-recall contract: the
    multi-index probe plan (round-8, plan_simhash_probe — 4 bands of
    15 bits probing all <=2-flip key variants, replacing round-7's
    11x5-bit equality banding) ensures every pair within hamming 10 is
    a candidate by pigeonhole, so after the bit_count verify the
    result provably EQUALS brute force — which is exactly what the
    oracle computes (all-pairs hamming join over the simhash values,
    no index to mirror). The wide keys cut unrelated-value collisions
    ~23x (BASELINE.md round-8) while never materializing the quadratic
    pair space; the oracle side is only feasible because the gate runs
    at fixture scale."""
    docs = table(spark, sf_dir, "documents")
    return simhash_near_dup(
        docs, "doc_id", tokens("text"), threshold=10, exact_recall=True
    )


def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (F.percentile — the sort-based exact
    form; both engines use linear interpolation so results are
    bit-identical; for 100 TB use approx_percentile instead, traded
    deliberately: sketch outputs are engine-specific)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
        F.min("l_extendedprice").alias("p_min"),
        F.max("l_extendedprice").alias("p_max"),
    )


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated correlated-subquery shape: orders above their
    customer's average order value. The per-customer average is a
    window over the fact (one shuffle) rather than a self-join; the
    average is cents-exact so the > comparison is engine-portable."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    avg = F.sum(cents).over(w) / 100.0 / F.count("*").over(w)
    return (
        orders.withColumn("cust_avg", avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
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


def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven profiling (§1 reflection pattern as a user op):
    per-column null/distinct counts of orders in one aggregate pass."""
    from etl_spark_spark.functions.profile import profile_columns

    return profile_columns(table(spark, sf_dir, "orders"))


def q_nation_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation as a single join (J8's idiomatic form,
    one shuffle): per-nation customer and supplier headcounts, nations
    present on either side, missing sides zero-filled."""
    customer = table(spark, sf_dir, "customer", columns=["c_nationkey"])
    supplier = table(spark, sf_dir, "supplier", columns=["s_nationkey"])
    c = customer.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.count("*").alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nation_key")).agg(
        F.count("*").alias("n_suppliers")
    )
    out = reconcile_full_outer(c, s, ["nation_key"], style="full_outer")
    return out.select(
        "nation_key",
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


def q_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL surface: the engine accepts SQL text over registered
    views (spark.sql), not just the DataFrame API — the same statement
    runs on Spark and the oracle verbatim."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_mktsegment AS segment,
               o_orderstatus AS status,
               count(*) AS n_orders,
               sum(cast(round(o_totalprice * 100) as bigint)) / 100.0D AS total
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderstatus
        """
    )


def q_dedup_any_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_any (A6 — arbitrary row per key) exposed through its
    deterministic projection: the per-flag distinct-key count. The kept
    row is arbitrary (hash-aggregate first()), so only key-derived
    outputs are comparable across engines."""
    li = table(spark, sf_dir, "lineitem")
    deduped = dedup_any(li, ["l_returnflag", "l_partkey"])
    return deduped.groupBy("l_returnflag").agg(
        F.count("*").alias("n_distinct_parts")
    )


def q_global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (top-k). The reference has no global top-k
    (SURVEY.md §2.6) — added for completeness. Spark plans this as
    TakeOrderedAndProject: per-partition top-k then a k-row merge on
    the driver side — no full global sort at any scale. Tiebreak on
    o_orderkey makes the k-set deterministic."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact md5 fingerprint + a winnowing-style
    rolling fingerprint (min over shingle hashes = 1-permutation
    MinHash) + BPE-ish subtoken count (letter-runs / digit-runs /
    single punctuation — a regex approximation of byte-pair
    pre-tokenization)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "text",
        tokens("text").alias("t"),
    )
    sh = word_shingles("t", 3)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return toks.select(
        "doc_id",
        fingerprint("text").alias("md5_fp"),
        min_sh.alias("winnow_fp"),
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ).cast("long").alias("n_subtokens"),
    )


def q_custkeys_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics) — set-op completeness beyond
    the reference's unions (SURVEY.md §2.7)."""
    orders = table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    y95 = year_range_filter(orders, "o_orderdate", 1995).select("o_custkey")
    y96 = year_range_filter(orders, "o_orderdate", 1996).select("o_custkey")
    return y95.intersect(y96)


def q_custkeys_only_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set semantics)."""
    orders = table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    y95 = year_range_filter(orders, "o_orderdate", 1995).select("o_custkey")
    y96 = year_range_filter(orders, "o_orderdate", 1996).select("o_custkey")
    return y95.subtract(y96)


def q_rollup_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — the idiomatic generalization of the
    reference's manual coarser re-group (A5,
    utils_ressarcimento.py:234-248)."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    sup = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    joined = li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        joined.rollup(
            F.col("s_nationkey").alias("nation_key"),
            F.col("l_suppkey").alias("supp_key"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "perdas"
            ),
            F.count("*").alias("n_rows"),
        )
    )


def q_supplier_share_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string surface parity: F.expr join condition (J4) +
    selectExpr projection with an inline window (P3/W2 — the
    reference's selectExpr window at utils_ressarcimento.py:223-230)."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    return (
        li.join(sup, F.expr("l_suppkey = s_suppkey"))
        .selectExpr(
            "s_nationkey AS nation_key",
            "l_suppkey AS supp_key",
            # 100.0D: Spark SQL parses a bare 100.0 as DECIMAL(3,1),
            # which would make the division decimal-typed; D forces double
            "sum(cast(round(l_extendedprice * 100) as bigint)) "
            "over (partition by l_suppkey) / 100.0D AS supp_total",
        )
        .distinct()
    )


def q_events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props parsed to MapType via from_json (vs the path-string
    get_json_object in events_by_type) — §7 extension surface."""
    events = read_events(spark, sf_dir, with_ts=False)
    props_map = F.from_json(F.col("props"), "map<string,int>")
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            props_map.getItem("k").alias("k_val"),
        )
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (each event lands in 2
    windows)."""
    events = read_events(spark, sf_dir)
    return sliding_agg(
        events,
        "ts",
        "1 hour",
        "30 minutes",
        [F.col("event_type")],
        [F.count("*").alias("n_events")],
    ).select("window_start", "event_type", "n_events")


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


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS rewritten as a LEFT SEMI join (the only
    join type Spark offers for decorrelated EXISTS — new shape vs the
    anti-join in customers_without_orders). The semi join keeps the
    orders side unduplicated however many lineitems match, and the
    lineitem side is reduced to the join key before shuffling."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    return (
        window.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over a computed measure (unit
    price), then join back to dimensions. Window row_number with a
    full deterministic tiebreak (unit, suppkey) — identical ORDER BY in
    the oracle — so ties cannot flap. Division happens before the
    window (same IEEE op in both engines)."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    part = table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    sup = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit"), F.col("l_suppkey")
    )
    # dimension filter BEFORE the window: per-part windows are
    # independent, so pre-joining the (broadcast) filtered part dim
    # shrinks the window's shuffle input ~10x with identical results
    best = (
        li.select("l_partkey", "l_suppkey", unit)
        .join(
            F.broadcast(part.filter(F.col("p_size") <= 5)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        best.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_brand").alias("brand"),
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("unit").alias("best_unit_price"),
        )
    )


def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping levels in
    one pass (rollup_losses covers ROLLUP; this pins the full lattice).
    Money sums in integer cents -> bit-stable at any parallelism."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )
    return li.cube(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
    ).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


def q_priority_return_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide) — TPC-H Q12 flavor: per order priority, count
    lineitems by return flag as columns. Spark's groupBy().pivot() with
    an EXPLICIT value list (no extra distinct job, stable columns),
    mirrored in SQL as conditional aggregation. Absent combinations are
    coalesced to 0 so both sides agree."""
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    pivoted = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "priority",
        F.coalesce(F.col("A"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("N"), F.lit(0)).alias("n_n"),
        F.coalesce(F.col("R"), F.lit(0)).alias("n_r"),
    )


def q_daily_dense_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: per-priority daily order counts for
    1995-01, DENSIFIED — days with no orders appear with n_orders=0.
    The spine is generated with sequence()+explode (no driver loop)
    and cross-joined against the distinct priorities (both sides tiny:
    days x priorities), then the actual counts left-join in. The gap
    row a naive groupBy silently drops is exactly what trend/anomaly
    jobs need present."""
    orders = table(spark, sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])
    jan = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp_ntz"))
    )
    counts = jan.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("long").alias("n_orders"))
    spine_days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-01-31").cast("date"),
            )
        ).alias("__d")
    ).select(F.col("__d").cast("string").alias("day"))
    priorities = jan.select(
        F.col("o_orderpriority").alias("priority")
    ).distinct()
    spine = spine_days.crossJoin(F.broadcast(priorities))
    return spine.join(counts, ["day", "priority"], "left").select(
        "day",
        "priority",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )


def q_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier flagging: median + MAD (median absolute
    deviation) per return flag, flag rows with |x - median| > 10 * MAD.
    Both medians run through exact_group_quantiles (distribution agg +
    window over the COMPACT per-distinct-value distribution) rather
    than F.percentile, whose TypedImperativeAggregate buffers every
    group value in the aggregation buffer — 3 groups x 2B rows at
    100x is an executor-OOM aggregate; the distribution form shrinks
    to distinct values first. Discrete-quantile semantics (smallest v
    with cum >= ceil(q*n)), same as q_exact_price_quartiles."""
    from etl_spark_spark.operators.stats import exact_group_quantiles

    li = table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    med = exact_group_quantiles(
        li, ["l_returnflag"], "l_extendedprice", qs=(0.5,)
    ).select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.col("q50").alias("median_price"),
    )
    with_dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "__dev", F.abs(F.col("l_extendedprice") - F.col("median_price"))
    )
    mad = exact_group_quantiles(
        with_dev, ["l_returnflag"], "__dev", qs=(0.5,)
    ).select("l_returnflag", F.col("q50").alias("mad"))
    flagged = (
        with_dev.join(F.broadcast(mad), "l_returnflag")
        .filter(F.col("__dev") > 10 * F.col("mad"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_outliers"))
    )
    return (
        med.join(F.broadcast(mad), "l_returnflag")
        .join(flagged, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "n_rows",
            "median_price",
            "mad",
            F.coalesce(F.col("n_outliers"), F.lit(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def q_doc_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k per-group sampling: 5 docs per source,
    chosen by content-addressed md5 order (seed-stable across runs and
    cluster layouts). Planned as row_number + filter(rn <= k), which
    Spark >= 3.5 executes with WindowGroupLimit — every map partition
    pre-prunes to its local top-k per group BEFORE the exchange, so a
    hot source ships ~n_mappers x k rows, not its full row count (the
    measured winner over the two-phase aggregate form for plain
    ranked top-k; see BASELINE.md skew bench). Plan gate pins the
    WindowGroupLimit node."""
    docs = table(spark, sf_dir, "documents", columns=["doc_id", "source"])
    order = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(order.asc(), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source", F.col("rn").cast("long").alias("rn"))
    )


def q_scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension history: fold two customer snapshots
    (the base table, then a derived second snapshot where every 10th
    customer's balance moved) through scd2_apply. Changed keys carry a
    closed row (valid_to stamped) plus a new current row; unchanged
    keys keep their original open row. Pure DataFrame fold with
    literal as_of stamps, so the full history is bit-reproducible and
    SQL-expressible."""
    from etl_spark_spark.operators.scd import scd2_apply

    snap1 = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal"]
    )
    snap2 = snap1.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    )
    h1 = scd2_apply(None, snap1, ["c_custkey"], "2024-01-01")
    return scd2_apply(h1, snap2, ["c_custkey"], "2024-02-01")


def q_doc_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency scoring (C4/Gopher-family quality signal with
    CORPUS state): each document's distinct-bigram coverage against a
    reference slice of the corpus (doc_id md5 bucket != '0', the same
    deterministic split doc_training_prep uses). Integer/rational by
    design — doc-frequency counts and one int/int division — so every
    value hash-matches the SQL oracle; a log-prob LM score would be
    accumulation-order and libm dependent."""
    from etl_spark_spark.operators.corpus_stats import (
        bigram_doc_frequency,
        doc_bigram_novelty,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("t")
    )
    ref_docs = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) != "0"
    )
    ref = bigram_doc_frequency(ref_docs, "doc_id", "t")
    return doc_bigram_novelty(docs, "doc_id", "t", ref, min_df=2)


def q_returns_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long, the melt/stack operator family): the
    per-returnflag wide aggregate (sum qty / revenue cents / row count)
    melted to (l_returnflag, metric, value) rows with ``stack`` — a
    Generate node that multiplies rows MAP-SIDE next to the aggregate,
    no extra shuffle. Values are integer-exact (cents / counts) so the
    melted doubles compare bit-identically."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        (F.sum(cents) / 100.0).alias("revenue"),
        F.count("*").cast("double").alias("n_rows"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'revenue', revenue, "
            "'n_rows', n_rows) AS (metric, value)"
        ),
    )


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketches — the property that makes sketch aggregation
    work at 100 TB: per-returnflag HLL sketches (hll_sketch_agg) are
    UNIONED (hll_union_agg) into a grand total without rescanning the
    data, exactly how a rollup over pre-aggregated sketch tables runs
    in production. Emitted as the driver-hashable derived form: exact
    row counts value-matched by the oracle, plus booleans asserting
    each HLL estimate (per-flag AND the unioned total) within 3-sigma
    of the exact distinct count computed alongside."""
    li = table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_agg(l_partkey)").alias("__sk"),
        F.count_distinct("l_partkey").alias("__exact_d"),
        F.count("*").alias("n_rows"),
    )
    flags = per_flag.select(
        "l_returnflag",
        "n_rows",
        (
            F.abs(F.expr("hll_sketch_estimate(__sk)") - F.col("__exact_d"))
            <= 0.15 * F.col("__exact_d")
        ).alias("distinct_ok"),
    )
    total_exact = li.agg(
        F.count_distinct("l_partkey").alias("__exact_d"),
        F.count("*").alias("n_rows"),
    )
    total = (
        per_flag.agg(F.expr("hll_union_agg(__sk)").alias("__sk"))
        .crossJoin(total_exact)
        .select(
            F.lit("__total").alias("l_returnflag"),
            "n_rows",
            (
                F.abs(
                    F.expr("hll_sketch_estimate(__sk)") - F.col("__exact_d")
                )
                <= 0.15 * F.col("__exact_d")
            ).alias("distinct_ok"),
        )
    )
    return flags.unionByName(total)


def q_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed EXACT Pearson correlation (quantity vs price) per
    return flag: both measures fixed-pointed to integer cents, the five
    sufficient statistics summed exactly (long / decimal(38,0) — both
    associative, so any shuffle order gives the same bits), and the
    final double math a fixed IEEE sequence mirrored by the oracle
    (DuckDB HUGEINT sums; int->double via VARCHAR for correct
    rounding). The built-in corr() is a float accumulation — order-
    dependent and not portable; this shape is, at any scale."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    d = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    s = d.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("n") * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
    denx = (dec("n") * F.col("sxx") - dec("sx") * dec("sx")).cast("double")
    deny = (dec("n") * F.col("syy") - dec("sy") * dec("sy")).cast("double")
    return s.select(
        "l_returnflag",
        "n",
        (num / F.nullif(F.sqrt(denx * deny), F.lit(0.0))).alias(
            "corr_qty_price"
        ),
    )


def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth: lag (days since the customer's previous
    order), ntile quartile and percent_rank of order value per
    customer. Every window has a full deterministic tiebreak, so
    rank-family outputs can't flap; dates leave as ISO strings."""
    orders = table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    wd = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey")
    )
    wv = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(wd)
        ).alias("gap_days"),
        F.ntile(4).over(wv).alias("value_quartile"),
        F.percent_rank().over(wv).alias("value_prank"),
    )


def q_customer_year_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order breadth: per customer, the sorted distinct
    order years as a CSV string (arrays never leave as array columns —
    the driver canonicalizer can't sort list cells), the year count,
    and a filter() over the array (years >= 1996). collect_set order is
    nondeterministic; sort_array canonicalizes before any use."""
    orders = table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    years = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set(F.year("o_orderdate"))).alias("ys")
    )
    return years.select(
        "o_custkey",
        F.array_join(
            F.transform(F.col("ys"), lambda y: y.cast("string")), ","
        ).alias("years_csv"),
        F.size("ys").alias("n_years"),
        F.size(F.filter(F.col("ys"), lambda y: y >= 1996)).alias(
            "n_years_since_1996"
        ),
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


def q_doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed train/val/test split (md5 of the
    doc id — reproducible across runs/engines/layouts, unlike
    df.sample) rolled up per (split, lang). Assignment is one map-side
    expression; the only shuffle is the final small aggregate."""
    docs = table(spark, sf_dir, "documents")
    split = hash_split(
        docs, "doc_id", [("train", "d"), ("val", "f"), ("test", None)]
    )
    return split.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling rates (domain rebalancing):
    downsample dominant English hard, keep rare strata whole. Pure
    map-side filter — zero shuffles, discarded rows never move."""
    docs = table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        docs,
        "doc_id",
        "lang",
        {"en": "40", "zh": "c0"},  # en ~25%, zh ~75%
        default="ff",  # everything else ~99.6%
    )
    return kept.select("doc_id", "lang")


def q_doc_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-stable (leakage-safe) split: hash the SOURCE, not the doc
    id, so every doc of a crawl domain lands in the same split — near
    dups cluster within domains, and splitting by doc id would leak
    them across train/test. Same zero-shuffle map expression, coarser
    key."""
    docs = table(spark, sf_dir, "documents")
    split = hash_split(
        docs, "source", [("train", "d"), ("val", "f"), ("test", None)]
    )
    return split.groupBy("source", "split").agg(F.count("*").alias("n_docs"))


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (Gopher-style quality rule):
    duplicate-word and duplicate-3-gram fractions. Map-only — the token
    and shingle arrays are materialized once per row (projection
    barriers keep the split() from being re-inlined per element_at),
    then counted; zero shuffles at any scale."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("__t"))
    sh = t.select("doc_id", "__t", word_shingles("__t", 3).alias("__s"))
    return sh.select(
        "doc_id",
        F.size("__t").cast("long").alias("n_words"),
        F.size(F.array_distinct("__t")).cast("long").alias("n_uniq_words"),
        F.size("__s").cast("long").alias("n_3grams"),
        F.size(F.array_distinct("__s")).cast("long").alias("n_uniq_3grams"),
        dup_fraction("__t").alias("dup_word_frac"),
        dup_fraction("__s").alias("dup_3gram_frac"),
    )


def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents. The fixture corpus is synthetic
    word salad with no PII, so the query first injects deterministic
    PII (email/phone/card/IP, keyed off doc_id residues — the SQL
    oracle injects the identical strings), then runs the staged
    count-and-redact scrubber. Map-only at any scale."""
    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    d.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 4 == 1,
                F.concat(
                    F.lit(" call +55 "),
                    (d % 7000 + 3000).cast("string"),
                    F.lit("-"),
                    (d % 9000 + 1000).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 2,
                F.concat(
                    F.lit(" card 4012-8888-8888-"),
                    (d % 9000 + 1000).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 3,
                F.concat(
                    F.lit(" from 10."),
                    (d % 256).cast("string"),
                    F.lit(".0."),
                    (d % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("pii_text"),
    )
    scrubbed = scrub_pii(injected, "pii_text")
    return scrubbed.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_cc",
        "n_phone",
        F.length("clean_text").cast("long").alias("n_chars_clean"),
        F.md5("clean_text").alias("clean_checksum"),
    )


def q_source_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha=0.5) source rebalancing to a fixed
    doc budget: rare crawl domains are upweighted vs proportional
    sampling. Keep decision is integer cross-multiplied md5 selection
    — bit-reproducible; see operators.sampling.temperature_sample."""
    docs = table(spark, sf_dir, "documents")
    kept = temperature_sample(docs, "doc_id", "source", budget=150)
    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    kcounts = kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept")
    )
    return counts.join(kcounts, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


def q_doc_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: every doc gets a seeded
    content-addressed shuffle key (md5(seed#id)) — reshuffling is a
    seed change, re-runs are reproducible, and the order is
    layout-independent. The full-corpus materialization path is
    sinks.write_range_sorted on the key (range exchange + local sort,
    no global sort); this query form takes the first 20 docs, which
    plans as TakeOrderedAndProject (no full sort either)."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("seed42#"), F.col("doc_id").cast("string")))
    first = (
        docs.select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(20)
    )
    w = Window.orderBy("shuffle_key")
    return first.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def q_fuzzy_code_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: dirty record codes (one char deleted at a
    doc_id-keyed position) matched back to the clean directory with a
    prefix/suffix-blocked Levenshtein join — never all-pairs. The
    DuckDB oracle IS the unblocked all-pairs ground truth, so a green
    row also proves the blocking lost no distance-1 match (the
    operator's completeness guarantee, operators/fuzzy.py)."""
    docs = table(spark, sf_dir, "documents")
    clean = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12).alias("code"),
    )
    dirty = clean.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("dirty_id"),
        F.expr(
            "concat(substring(code, 1, CAST(doc_id % 8 + 2 AS INT)), "
            "substring(code, CAST(doc_id % 8 + 4 AS INT), 12))"
        ).alias("dirty_code"),
    )
    pairs = fuzzy_join(
        dirty, clean, "dirty_id", "dirty_code", "doc_id", "code", max_dist=1
    )
    enc = F.col("distance") * 10000000 + F.col("doc_id")
    return (
        pairs.groupBy("dirty_id", "dirty_code")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.min(enc).alias("__best"),
        )
        .select(
            "dirty_id",
            "dirty_code",
            "n_matches",
            F.expr("__best DIV 10000000").cast("long").alias("best_distance"),
            (F.col("__best") % 10000000).cast("long").alias("best_match_id"),
        )
    )


def q_returns_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization cube/rollup are
    sugar for): per-(flag,status), per-flag, and per-status revenue in
    ONE pass — Spark expands the sets map-side and aggregates once
    instead of scanning per grouping. grouping() indicators
    disambiguate aggregated-away NULLs."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count("*").alias("n_items"),
            money_sum(revenue).alias("revenue"),
        )
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: 7-table join with the
    nation dimension in TWO roles (customer nation -> region scope,
    supplier nation -> share numerator). The deepest join tree in the
    suite — every dimension broadcast, the fact never shuffled until
    the final per-year aggregate; volumes summed in integer cents so
    the share ratio is bit-reproducible at any parallelism."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    scoped = (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
    )
    return (
        scoped.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("__c", cents)
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("n2.n_name") == "NATION_7", F.col("__c")).otherwise(
                    F.lit(0)
                )
            ).alias("__num"),
            F.sum("__c").alias("__den"),
        )
        .select(
            "o_year",
            (F.col("__den") / 100.0).alias("total_vol"),
            (F.col("__num") / 100.0).alias("share_vol"),
            F.round(F.col("__num") / F.col("__den"), 6).alias("mkt_share"),
        )
    )


def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over lineitem: range +
    domain rules folded into ONE aggregate pass (map-side partial
    sums — 50 rules cost the same scan as 1), plus a referential rule
    (orphan l_orderkey) as a left-anti join. Fail-closed on NULL."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    rules = {
        "qty_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_range": (F.col("l_discount") >= 0)
        & (F.col("l_discount") <= 0.1),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "linestatus_domain": F.col("l_linestatus").isin("O", "F"),
    }
    metrics = expectation_metrics(li, rules)
    n_li = li.agg(F.count("*").cast("long").alias("n_rows"))
    fk = (
        fk_violation_count(li, "l_orderkey", orders, "o_orderkey")
        .crossJoin(n_li)
        .select(
            F.lit("orderkey_fk").alias("rule"), "n_rows", "n_violations"
        )
    )
    return metrics.unionByName(fk)


def q_doc_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (cap docs per crawl domain) via the SKEW-SAFE
    two-phase top-k aggregate: longest 5 docs per source, ties to the
    smaller doc_id. No ranking window — a hot source never lands on one
    task; phase 2 merges at most n_salts*k rows per source."""
    docs = table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    order = F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))
    return partial_topk(docs, ["source"], order, k=5, n_salts=8)


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 whitespace tokens by frequency (ties
    to the lexicographically smaller token). Explode + map-side partial
    count + TakeOrderedAndProject — the wordcount shape that scales."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: hold out the md5-bucket-'f' docs as
    the eval set, score every remaining doc by the fraction of its
    distinct 3-gram shingles that appear anywhere in the eval set.
    The eval shingle set rides a broadcast-able equi-join (benchmarks
    are MBs, corpora TBs) — the corpus is scanned once, no all-pairs."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    pairs = shingle_set(toks, "doc_id", word_shingles("t", 3))
    is_eval = hash_bucket("doc_id", 1) == "f"
    scored = contamination_scores(
        pairs.filter(~is_eval), pairs.filter(is_eval), "doc_id"
    )
    return scored.select(
        "doc_id", "n_shingles", "n_hits", "contamination"
    )


def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-source deterministic doc layout, each doc
    assigned to the 256-BPE-token training chunk its start offset falls
    in. Window cumsum scoped to the shard — shards pack in parallel,
    nothing globally ordered."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", bpe_token_count("text").cast("long").alias("n_tokens")
    )
    return pack_by_token_budget(
        docs, ["source"], "doc_id", "n_tokens", budget=256
    )


def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 distinguishing terms by the rational tf/df score
    (chosen over tf*ln(N/df) so the ordering is a single IEEE division
    — bit-identical across engines; same ranking intent: frequent in
    the doc, rare in the corpus). Two hash aggregates + a bounded
    per-doc window."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    scored = tf.join(dfq, "token").withColumn(
        "score", F.col("tf") / F.col("doc_freq")
    )
    top = top_k_per_group(
        scored, ["doc_id"], [F.desc("score"), F.asc("token")], k=3
    )
    return top.select("doc_id", "token", "tf", "doc_freq", "score")


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: exact n-gram-Jaccard pairs (>=0.8)
    -> connected components via distributed min-label propagation ->
    (doc_id, cluster_id = component min id). The iterative step every
    dedup pipeline needs between "pairs found" and "canonicals kept";
    oracle is a DuckDB recursive CTE over the same pair set, so even
    the ITERATIVE operator is hash-checked, not rows-only."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    pairs = ngram_jaccard_pairs(toks, "doc_id", word_shingles("t", 3), threshold=0.8)
    comps = connected_components(pairs, "id_a", "id_b")
    return comps.select(F.col("node").alias("doc_id"), "cluster_id")


def q_customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows (ntile quartiles, percent_rank,
    cume_dist) over per-customer spend, PARTITIONED BY NATION — the
    scale-correct shape: a global ntile would serialize the whole
    ranking onto one task; per-nation windows rank in parallel and the
    shape survives 100x data. Spend is the order-independent
    integer-cents sum; ties break on custkey."""
    cust = table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    orders = table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    spend = (
        orders.groupBy("o_custkey")
        .agg(money_sum("o_totalprice").alias("total_spend"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_custkey", "n_name", "total_spend")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("total_spend"), F.asc("o_custkey")
    )
    return spend.select(
        "o_custkey",
        "n_name",
        "total_spend",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    both join sides (brand/size from part, quantity from lineitem).
    The disjunction cannot be pushed as a whole, but Catalyst's CNF
    conversion extracts the per-table residuals (size range, quantity
    range) down to each scan; the join itself broadcasts part. One
    row out, summed in integer cents."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    b, s, q = F.col("p_brand"), F.col("p_size"), F.col("l_quantity")
    cond = (
        ((b == "Brand#1") & s.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#7") & s.between(1, 20) & q.between(10, 30))
        | ((b == "Brand#13") & s.between(5, 30) & q.between(20, 40))
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return j.filter(cond).agg(
        (F.sum(cents) / 100.0).alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


def q_exclusive_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (double correlation): orders that have at least
    one line from a low-nation supplier (EXISTS -> LEFT SEMI) and NO
    line from any other supplier (NOT EXISTS -> LEFT ANTI), counted
    per priority. Both correlated subqueries decorrelate to key-only
    join sides — the lineitem side is reduced to l_orderkey before
    either shuffle, and the supplier lookup broadcasts."""
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    sup = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li_n = li.join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("l_orderkey", "s_nationkey")
    in_a = li_n.filter(F.col("s_nationkey") < 5).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    out_a = li_n.filter(F.col("s_nationkey") >= 5).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(in_a, "o_orderkey", "left_semi")
        .join(out_a, "o_orderkey", "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, size),
    excluding complaint suppliers (NOT IN -> LEFT ANTI on a tiny
    filtered side). count_distinct plans as the two-phase distinct
    aggregate (partial distinct map-side); the part join broadcasts."""
    li = table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    part = table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    bad = (
        table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in target segments whose balance
    beats the average positive balance (scalar subquery -> 1-row
    broadcast crossJoin) and who have gone IDLE — no order since
    2000-06-01 (NOT EXISTS -> LEFT ANTI on the key-only projection of
    the date-filtered orders; the date filter pushes to the scan),
    grouped per segment. Balance sums in integer cents; the average
    threshold is computed as an exact cents-sum / count so the
    comparison double is partition-order independent."""
    cust = table(
        spark, sf_dir, "customer",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )
    orders = (
        table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # exact average: integer-cents sum / count, so the threshold double
    # is bit-identical regardless of partitioning (a plain F.avg would
    # sum doubles in shuffle order)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            / (F.count("*") * 100.0)
        ).alias("__avg_bal")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            (F.sum(cents) / 100.0).alias("total_bal"),
        )
    )


def q_user_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, the rolling 7-day event-value
    sum at each event (rangeBetween on epoch days — a RANGE frame, not
    ROWS: all events inside the trailing week count whatever their row
    distance). One shuffle on user_id; cents-summed for bit-exactness
    against the oracle's RANGE BETWEEN frame."""
    ev = read_events(spark, sf_dir)
    day = F.expr("unix_micros(ts) DIV 86400000000")
    base = ev.select(
        "user_id",
        F.col("event_id"),
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("__cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        "day",
        (F.sum("__cents").over(w) / 100.0).alias("week_value"),
    )


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis (the CEP-lite shape): per 5-minute-gap
    session, the ordered event-type path and whether the session
    CONVERTED (a purchase strictly after a view). Sessionization is
    the shared one-shuffle lag/sum pass; the path is a sorted
    collect_list folded per session — array expressions, no Python."""
    from etl_spark_spark.streaming.windows import sessionize_batch

    ev = read_events(spark, sf_dir)
    sess = sessionize_batch(ev, "ts", ["user_id"], gap_seconds=300)
    rows = sess.select(
        "user_id",
        "session_id",
        F.struct(
            F.unix_micros(F.col("ts")).alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
        ).alias("__e"),
    )
    ordered = rows.groupBy("user_id", "session_id").agg(
        F.array_sort(F.collect_list("__e")).alias("__es")
    )
    types = F.transform(F.col("__es"), lambda e: e["et"])
    first_view = F.array_position(types, "view")
    # last purchase = size - position of first purchase in the reversed
    # array + 1 (0 when absent)
    rev_pos = F.array_position(F.reverse(types), "purchase")
    last_purchase = F.when(
        rev_pos > 0, F.size(types) - rev_pos + 1
    ).otherwise(F.lit(0))
    return ordered.select(
        "user_id",
        "session_id",
        F.array_join(types, ">").alias("path"),
        ((first_view > 0) & (last_purchase > first_view)).alias("converted"),
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the part's average quantity, per brand. The correlated
    scalar subquery (per-part avg) is DECORRELATED by hand into an
    aggregate + join — on Spark that means one partial+final hash
    aggregate over lineitem and a broadcast-able per-part threshold
    table, instead of a re-executed subquery per row. The threshold
    avg is exact in IEEE double (integral quantities, sum < 2^53), so
    the boundary comparison is engine-portable; revenue is summed in
    integer cents."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    thresholds = li.groupBy("l_partkey").agg(
        ((F.sum("l_quantity") / F.count("*")) * 0.2).alias("qty_cap")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .groupBy("p_brand")
        .agg(
            (F.sum(cents) / 100.0).alias("small_qty_revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
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


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals in 20 bins — the profiling
    primitive. Bin edges come from one global min/max aggregate
    (broadcast back as a 1-row literal join); binning is a pure map
    expression, so the corpus is scanned once and shuffles only the
    (bin -> count) partials. The bin formula uses one double multiply
    +floor identical in both engines; the max value is clamped into the
    last bin (the standard right-closed final interval)."""
    orders = table(spark, sf_dir, "orders")
    rng = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    n_bins = 20
    binned = orders.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / n_bins)
            ).cast("long"),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").cast("long").alias("n_orders"))


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion over the event stream: per user, the
    earliest view, the earliest click AFTER that view, and the earliest
    purchase AFTER that click — then one row counting how many users
    reached each stage. One grouped pass collects each user's (ts,
    type) pairs; the staged "earliest after previous stage" logic is
    pure array expressions over that grouped row — no self-joins, no
    window over the raw stream, one shuffle total."""
    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "event_type")).alias("evs"),
    )

    def earliest(kind, after_col):
        cond = lambda e: (e["event_type"] == F.lit(kind)) & (
            e["ts"] > F.col(after_col)
        )
        return F.array_min(F.filter("evs", cond)["ts"])

    staged = (
        per_user.withColumn(
            "t_view",
            F.array_min(
                F.filter("evs", lambda e: e["event_type"] == F.lit("view"))["ts"]
            ),
        )
        .withColumn("t_click", earliest("click", "t_view"))
        .withColumn("t_purchase", earliest("purchase", "t_click"))
    )
    return staged.agg(
        F.count(F.col("t_view")).cast("long").alias("n_view"),
        F.count(F.col("t_click")).cast("long").alias("n_view_click"),
        F.count(F.col("t_purchase")).cast("long").alias("n_view_click_purchase"),
    )


def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted per week-offset of later activity — the standard cohort
    triangle. First week is a per-user min (one aggregate), offsets are
    integer date arithmetic, and the triangle is a second aggregate:
    two shuffles total on (user) then (cohort, offset)."""
    ev = read_events(spark, sf_dir).select("user_id", "ts")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = ev.select("user_id", wk.alias("week")).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def q_doc_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (fastText-style hashed-n-gram
    logistic classifier, pyspark.ml): weak-label every document with
    the deterministic heuristic, train distributed L-BFGS, re-score
    the corpus with the model. The raw probability is a trained-model
    float (treeAggregate sum order) and not SQL-expressible, so the
    query emits the driver-hashable derived form: one row per document
    with the SQL-derivable weak label plus ``model_agrees``
    (prediction == weak label — the trained model separates the
    fixture with min |p-0.5| margin ~0.35, so the boolean is stable
    across partitionings). Held-out generalization is pinned in
    tests."""
    from etl_spark_spark.functions.text import LANG_PROFILES
    from etl_spark_spark.operators.classify import (
        score_quality,
        train_quality_model,
        weak_quality_label,
    )

    docs = table(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "weak_label", weak_quality_label("text", LANG_PROFILES["en"])
    )
    model = train_quality_model(labeled, "text", "weak_label")
    scored = score_quality(model, labeled, "text")
    return scored.select(
        "doc_id",
        "weak_label",
        (F.col("quality_pred") == F.col("weak_label")).alias("model_agrees"),
    )


def q_doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup ingestion: the corpus arrives as three
    id-ordered batches, each filtered against the signature index of
    everything seen so far (the ongoing-crawl pattern — historical text
    is never rescanned, only its compact minhash index). Because the
    batch fold provably equals the one-shot estimator pass, the oracle
    is the one-shot SQL over the whole corpus."""
    from etl_spark_spark.functions.text import tokens, word_shingles
    from etl_spark_spark.operators.neardup import incremental_near_dup

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    bounds = [(0, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi + 1)]
    index = None
    kept_parts = []
    for lo, up in bounds:
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
        ).withColumn("t", tokens("text"))
        kept, index = incremental_near_dup(
            batch, index, "doc_id", word_shingles("t", 3)
        )
        # materialize the index between folds, as a real ingestion
        # pipeline does by persisting it (streaming/dedup.py writes it
        # as parquet): without this each fold re-derives the whole
        # index lineage and the plan re-scans every earlier batch
        index = index.localCheckpoint()
        kept_parts.append(kept.select("doc_id", "source"))
    out = kept_parts[0]
    for part in kept_parts[1:]:
        out = out.unionByName(part)
    return out


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for RAG / long-context training: 32-token
    windows advancing by 24 (8-token overlap). Expression-only
    (sequence + posexplode + slice), map-side row multiplication, no
    shuffle."""
    from etl_spark_spark.functions.text import tokens
    from etl_spark_spark.operators.packing import chunk_by_tokens

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return chunk_by_tokens(toks, "doc_id", "t", chunk_tokens=32, overlap=8)


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement:
    draw 50 documents with probability proportional to length
    (n_chars), content-addressed so the draw is engine-reproducible.
    Plan is map-only + TakeOrderedAndProject — no global sort."""
    from etl_spark_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    return weighted_sample_without_replacement(docs, "doc_id", "n_chars", k=50)


def q_doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation composite: quality gate ->
    exact dedup (keep min id per fingerprint) -> near-dup removal
    (drop the higher id of each >=0.8 3-gram-Jaccard pair among
    survivors). The whole multi-stage pipeline is oracle-checked as one
    unit — the SQL mirror recomputes every stage on the same rules."""
    from etl_spark_spark.pipelines.curation import curate_documents

    docs = table(spark, sf_dir, "documents")
    return curate_documents(docs)


def q_doc_curation_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation composite on its PRODUCTION near-dup path: quality
    gate -> exact dedup -> near-dup removal via MinHash(8)+LSH(4x2)
    with the heavy-bucket STAR mitigation engaged (bucket_cap=2, so
    this corpus's natural size->2 band buckets actually exercise the
    star path, not the passthrough — the production default is 4096,
    a no-op at organic dup rates; see curate_documents). The oracle
    replays every stage in SQL: quality scoring, fingerprint dedup,
    identical-shingle-set collapse, minhash banding, bucket sizing +
    hub, capped candidate generation, exact-Jaccard verify at 0.8,
    pair re-expansion, and the final drop-higher-id anti-join — so
    the cap's (pair -> cluster) contract change is value-gated inside
    the composite, not just in the isolated neardup_bucket_cap row."""
    from etl_spark_spark.pipelines.curation import curate_documents

    docs = table(spark, sf_dir, "documents")
    return curate_documents(docs, pair_stage="minhash", bucket_cap=2)


def q_doc_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end pipeline: curation (quality gate, exact dedup,
    near-dup removal) -> benchmark decontamination (bucket-'0' holdout)
    -> content-addressed train/val/test split -> per-(split, source)
    sequence packing into 256-BPE-token chunks. One oracle checks the
    whole composite bit-for-bit, so a regression in ANY stage surfaces
    here even if the stage's own query still passes."""
    from etl_spark_spark.pipelines.curation import curate_for_training

    docs = table(spark, sf_dir, "documents")
    return curate_for_training(docs)


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation in two roles joined through DIFFERENT
    fact paths (supplier side via lineitem, customer side via orders)
    with a disjunctive cross-pair predicate that can only be applied
    AFTER both roles are attached. Both nation copies broadcast; the
    pair filter collapses the fact stream before the per-year
    aggregate; revenue in integer cents for bit-stable sums."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    customer = table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = table(spark, sf_dir, "nation")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    shipped = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    joined = (
        shipped.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(
            (
                (F.col("n1.n_name") == "NATION_1")
                & (F.col("n2.n_name") == "NATION_2")
            )
            | (
                (F.col("n1.n_name") == "NATION_2")
                & (F.col("n2.n_name") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in the corpus, so
    supply cost is the part's retail price — same plan shape, different
    constant). Profit per supplier-nation per order-year over a
    p_name LIKE-filtered part subset. The LIKE filter lands in the
    parquet scan via the broadcast part dim; profit is computed
    row-wise in cents before the aggregate."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    part = table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    nation = table(spark, sf_dir, "nation")
    cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("long")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("__c", cents)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum("__c") / 100.0).alias("profit"))
    )


def q_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    quarter, top 20. ORDER BY revenue DESC with a custkey tiebreak and
    the revenue computed in exact cents, so the LIMIT frontier is
    deterministic on both engines. Plans TakeOrderedAndProject — never
    a global sort of the full aggregate."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    customer = table(
        spark, sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation = table(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    q4_1995 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(q4_1995, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("__c", cents)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg((F.sum("__c") / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a SCALAR-SUBQUERY fraction
    of the global total. Decorrelated the Spark way: the per-part
    aggregate is computed once, the global total is a 1-row re-aggregate
    of it, and the threshold joins back via a broadcast crossJoin — the
    per-part aggregate is NOT computed twice and never round-trips the
    driver. Values in integer cents so share comparisons are exact."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = table(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_part = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .withColumn("__c", cents)
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.sum("__c").alias("__val_c"))
    )
    total = per_part.agg(
        F.sum("__val_c").alias("__total_c"), F.count("*").alias("__n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        # scale-free threshold (value > 2x the mean part value) as an
        # integer cross-multiply — no float edge, and unlike a fixed
        # global fraction the selectivity survives any corpus size
        # (TPC-H itself rescales Q11's fraction by 1/SF for the same
        # reason); identical arithmetic in the oracle
        .filter(F.col("__val_c") * F.col("__n_parts") > F.col("__total_c") * 2)
        .select("part_key", (F.col("__val_c") / 100.0).alias("value"))
    )


def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count
    INCLUDING zero-order customers — a left outer join into a
    two-level aggregate (count per customer, then customers per
    count). The filtered orders side is aggregated to (custkey, n)
    BEFORE joining so the second aggregate's input is one row per
    customer, not one per order."""
    customer = table(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("__n"))
    )
    return (
        customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue
    share for one ship-month) in a single pass — numerator and
    denominator as two conditional cent-sums in ONE aggregate, ratio
    taken once at the end (round 6 pins the float)."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    part = table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    return (
        month.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__c", cents)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("__c")).otherwise(F.lit(0))
            ).alias("__promo"),
            F.sum("__c").alias("__all"),
        )
        .select(
            (F.col("__promo") / 100.0).alias("promo_revenue"),
            (F.col("__all") / 100.0).alias("total_revenue"),
            F.round(100.0 * F.col("__promo") / F.col("__all"), 6).alias(
                "promo_pct"
            ),
        )
    )


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the
    global max — the classic view + scalar-max pattern. Revenue stays
    in integer cents through the max comparison, so 'equals the max'
    is an exact integer predicate (no float-equality flake); the max is
    a 1-row broadcast, not a driver collect."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .withColumn("__c", cents)
        .groupBy("l_suppkey")
        .agg(F.sum("__c").alias("__rev_c"))
    )
    best = revenue.agg(F.max("__rev_c").alias("__max_c"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("__rev_c") == F.col("__max_c"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            (F.col("__rev_c") / 100.0).alias("total_revenue"),
        )
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, joined back to header + customer. The lineitem side is
    fully aggregated (one row per order) before any join; order header
    and customer attach afterwards, customer broadcast. Quantity summed
    as integer units (whole-unit quantities) -> exact HAVING edge."""
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    customer = table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            "total_qty",
        )
    )


def q_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: the correlated 'availqty > 1/2 of
    shipped qty' subquery becomes 'this supplier shipped > 30% of the
    part's 1995 volume'). Two-level decorrelation: per-(part, supplier)
    aggregate joined to the per-part re-aggregate (derived from the
    first — the fact is scanned ONCE), then a LEFT SEMI join collapses
    qualifying parts into the supplier dimension. Nation-scoped."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    part = table(spark, sf_dir, "part", columns=["p_partkey", "p_name"])
    supplier = table(
        spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nation = table(spark, sf_dir, "nation")
    bolts_1995 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("%bolt%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("__q", F.round("l_quantity").cast("long"))
    )
    per_sp = bolts_1995.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("__q").alias("__sp_qty")
    )
    per_part = per_sp.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("__sp_qty").alias("__p_qty")
    )
    dominant = (
        per_sp.join(per_part, F.col("l_partkey") == F.col("__pk"))
        # integer cross-multiply for the 30% edge: 10*sp > 3*total
        .filter(F.col("__sp_qty") * 10 > F.col("__p_qty") * 3)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
        )
    )


def q_orders_pit_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join: enrich each order with the
    customer attribute that was CURRENT on the order date, against an
    SCD2 history (two snapshots: a 1995-06-01 bootstrap, then a
    1996-06-01 balance change for every 10th customer). The join is a
    broadcast equi-join on custkey with the validity range as a join
    filter — the standard PIT pattern; a LEFT join so orders placed
    before the dimension existed survive with NULL attributes (that
    edge is pinned, not papered over). Validity stamps are ISO strings
    compared lexicographically — portable to the oracle."""
    from etl_spark_spark.operators.scd import scd2_apply

    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    snap1 = table(spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    snap2 = snap1.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    )
    hist = scd2_apply(
        scd2_apply(None, snap1, ["c_custkey"], "1995-06-01"),
        snap2, ["c_custkey"], "1996-06-01",
    )
    od = F.date_format("o_orderdate", "yyyy-MM-dd")
    o = orders.withColumn("order_date", od)
    cond = (
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("order_date"))
        & (F.col("valid_to").isNull() | (F.col("order_date") < F.col("valid_to")))
    )
    return o.join(F.broadcast(hist), cond, "left").select(
        "o_orderkey",
        "o_custkey",
        "order_date",
        F.col("c_acctbal").alias("acctbal_at_order"),
        F.col("valid_from").alias("dim_from"),
    )


def q_doc_length_winsor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization — the standard outlier-taming step
    before length-based curation thresholds: clamp each document's
    length to its SOURCE's [p05, p95] band. The bands run through
    exact_group_quantiles (hash agg to the per-(source, n_chars)
    distribution, window over that COMPACT distribution) rather than
    F.percentile, whose TypedImperativeAggregate buffers every group
    value in the aggregation buffer — ~5 sources x billions of rows at
    100x is an executor-OOM aggregate; the distribution form shrinks
    to distinct lengths first. Discrete-quantile semantics (smallest v
    with cum >= ceil(q*n)), same as price_outliers; the tiny band
    table broadcasts back onto the fact and the clamp itself is pure
    codegen (no second shuffle of the fact)."""
    from etl_spark_spark.operators.stats import exact_group_quantiles

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    bands = exact_group_quantiles(
        docs, ["source"], "n_chars", qs=(0.05, 0.95)
    ).select(
        "source",
        F.col("q5").cast("double").alias("p05"),
        F.col("q95").cast("double").alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("n_chars").cast("double"), F.col("p05")), F.col("p95"))
    return (
        docs.join(F.broadcast(bands), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            clamped.alias("winsorized"),
            (
                (F.col("n_chars") < F.col("p05"))
                | (F.col("n_chars") > F.col("p95"))
            ).alias("was_clipped"),
        )
    )


_SCRATCH_DIRS: dict[str, str] = {}


def _scratch_dir(name: str) -> str:
    """Per-process scratch dir for side-effecting queries (merge_upsert,
    indexed_zorder_scan). One dir per query name per process: the first
    call mkdtemps and registers an atexit rmtree; later calls in the
    same process WIPE and reuse it. Repeated driver / bench /
    plan-snapshot runs therefore leave zero /tmp garbage behind
    (VERDICT r5), while two concurrent processes still get disjoint
    dirs (mkdtemp) so a bench and a mirror run cannot race on one
    table. Results stay deterministic — only the path changes."""
    import atexit
    import shutil
    import tempfile

    import glob
    import os

    # reap leftovers from processes that died without atexit (SIGTERM
    # from a timeout kill skips atexit): the owner pid is embedded in
    # the dir name, so a dir whose pid is gone AND whose mtime is past
    # the TTL is garbage. The TTL guards the PID-namespace hazard
    # (ADVICE r6): in a container sharing /tmp, a live sibling's pid is
    # absent from this namespace's /proc — age is the cross-namespace
    # signal that nobody is mid-query in the dir.
    import time

    reap_ttl_sec = 3600.0
    now = time.time()

    def _tree_is_live(path: str, deadline: float) -> bool:
        # a directory's own mtime only moves on DIRECT entry changes —
        # a sibling process writing inside nested subdirs (one long
        # query laying out table data) leaves the top-level mtime
        # stale, so the liveness signal is the NEWEST mtime anywhere in
        # the tree (ADVICE r7). The walk short-circuits on the FIRST
        # entry newer than the deadline (the dir is provably live) so a
        # large leftover table costs O(files) stats only when it is
        # genuinely all-stale and about to be reaped anyway (ADVICE r8)
        if os.path.getmtime(path) > deadline:
            return True
        for dirpath, _dirnames, filenames in os.walk(path):
            try:
                if os.path.getmtime(dirpath) > deadline:
                    return True
                for fn in filenames:
                    if (
                        os.path.getmtime(os.path.join(dirpath, fn))
                        > deadline
                    ):
                        return True
            except OSError:
                continue  # entry vanished mid-walk; other stats decide
        return False

    for stale in glob.glob(f"{tempfile.gettempdir()}/spark_graft_*_p*"):
        try:
            pid = int(stale.rsplit("_p", 1)[1].split("_", 1)[0])
            if (
                pid != os.getpid()
                and not os.path.exists(f"/proc/{pid}")
                and not _tree_is_live(stale, now - reap_ttl_sec)
            ):
                shutil.rmtree(stale, ignore_errors=True)
        except (ValueError, IndexError, OSError):
            pass

    root = _SCRATCH_DIRS.get(name)
    if root is None:
        root = tempfile.mkdtemp(
            prefix=f"spark_graft_{name}_p{os.getpid()}_"
        )
        _SCRATCH_DIRS[name] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
    return root


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO under the hash gate — the reference's flagship sink
    semantic (reference etl_job.py:79-85, ``merge_table_iceberg`` ON
    t.etiqueta = s.etiqueta) run through the catalog-less versioned
    emulation (sinks/versioned.py merge_into_versioned: COW snapshot +
    CAS commit):

    1. bootstrap the target with the even-custkey half of customer
       (batch 0, balances in exact integer cents);
    2. MERGE the custkey%3==0 batch (batch 1, balances bumped +$100):
       matched keys (custkey %6==0) are REPLACED whole-row, unmatched
       odd multiples of 3 are INSERTED;
    3. return the committed snapshot.

    The oracle replays the same MERGE in plain SQL (anti-join + union
    — the standard WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT
    expansion), so the upsert result itself sits under the row/schema/
    value-hash gate, not just pytest. Each call merges into a fresh
    private temp table (idempotent across driver/bench/plan-snapshot
    invocations; the ~2k-row demo table lives in a per-process scratch
    dir that is wiped on reuse and removed at exit — see
    ``_scratch_dir``). Round-7: the merges route through the
    PLUGGABLE backend interface (sinks/catalog.py merge_into) — a
    capability probe selects a real Delta/Iceberg ``MERGE INTO``
    where the jars exist and the versioned-parquet COW emulation
    here (this container has no catalog jars), so this oracle row
    now gates the adapter itself, not just the fallback. Scale note:
    the fallback rewrites only the TARGET table (one anti-join +
    union, shuffle on the merge key); a catalog MERGE rewrites
    matched files only — same semantics, different cost profile."""
    from etl_spark_spark.sinks.catalog import merge_into, read_merged

    cust = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    target0 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        cents.alias("acctbal_cents"),
        F.lit(0).alias("batch"),
    )
    source = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (cents + F.lit(10_000)).alias("acctbal_cents"),
        F.lit(1).alias("batch"),
    )
    from etl_spark_spark.sinks.catalog import detect_backend

    backend = detect_backend(spark)
    if backend == "versioned_parquet":
        target = _scratch_dir("merge_upsert")
    else:  # catalog backends take a table identifier, not a path
        target = "merge_upsert_demo"
        spark.sql(f"DROP TABLE IF EXISTS {target}")  # idempotent rerun
    merge_into(spark, target0, target, ["c_custkey"], backend=backend)
    merge_into(spark, source, target, ["c_custkey"], backend=backend)
    return read_merged(spark, target, backend=backend).select(
        "c_custkey", "c_name", "acctbal_cents", "batch"
    )


def q_cast_decimal_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven Decimal/TimestampNTZ cast policy (SURVEY §2 F16,
    reference etl_job.py:15-25) under the hash gate — the one §2 item
    that previously had no oracle row because the fixtures carry no
    DecimalType. The query STAGES a genuinely decimal-typed table
    (cast lineitem money columns to DECIMAL(18,4)/DECIMAL(9,6), write
    parquet, read back — the read schema IS decimal, asserted), then
    applies the policy three ways:

    - default: every decimal -> double (the reference's sink rule);
    - ``to=DecimalType(38,6)``: exact-decimal retention branch,
      emitted as a string so both engines pin the exact scaled digits;
    - ``timestamp_ntz=True``: timestamps -> TimestampNTZ, emitted as
      an ISO string (the repo's date-output convention).

    The oracle reproduces each branch with plain casts on the source
    rows, so the staged write/read roundtrip is proven value-lossless
    and the policy semantics are pinned cross-engine."""
    from etl_spark_spark.functions.nulls import cast_decimals

    li = table(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).filter(F.col("l_suppkey") <= 5)
    staged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price_dec"),
        F.col("l_discount").cast("decimal(9,6)").alias("disc_dec"),
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
    )
    root = _scratch_dir("cast_decimal")
    path = f"{root}/staged"
    staged.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    for c in ("price_dec", "disc_dec"):
        if not isinstance(back.schema[c].dataType, T.DecimalType):
            raise TypeError(
                f"staging failed: {c} read back as "
                f"{back.schema[c].dataType}, expected DecimalType"
            )
    # both policy modes CHAINED on one pipeline (no key join — the
    # synthetic fixture's (orderkey, linenumber) is not unique):
    # decimal(18,4) --exact policy--> decimal(38,6), freeze the exact
    # branch as a string, then --default policy--> double + NTZ. The
    # widening cast is exact, so the double branch equals casting the
    # original decimals directly (what the oracle does).
    exact = cast_decimals(back, to=T.DecimalType(38, 6))
    if not isinstance(exact.schema["price_dec"].dataType, T.DecimalType):
        raise TypeError("exact-retention policy lost the decimal type")
    dbl = cast_decimals(
        exact.withColumn(
            "price_dec38", F.col("price_dec").cast("string")
        ),
        timestamp_ntz=True,
    )
    if not isinstance(dbl.schema["ship_ts"].dataType, T.TimestampNTZType):
        raise TypeError("timestamp_ntz policy did not produce NTZ")
    return dbl.select(
        "l_orderkey",
        "l_linenumber",
        F.col("price_dec").alias("price_double"),
        F.col("disc_dec").alias("disc_double"),
        "price_dec38",
        F.date_format("ship_ts", "yyyy-MM-dd HH:mm:ss").alias("ship_ntz"),
    )


def q_indexed_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end z-order + stats-index scan path under the hash gate:
    write orders Morton-clustered on (o_custkey, o_totalprice)
    (sinks/zorder.py — codegen bit-interleave, one range exchange),
    then read it back through ``sources.stats_index.indexed_read``
    with ranges on BOTH clustered columns — file skipping from the
    per-file min/max manifest plus the exact residual filter, the
    lakehouse OPTIMIZE ZORDER BY + data-skipping loop reconstructed
    for plain parquet. The oracle runs the same two range predicates
    over the source table directly, so the gate proves the layout +
    prune + residual pipeline is row-for-row lossless. The
    n_files_read < n_files_total skipping claim is pinned by
    tests/test_stats_index.py (file counts are layout-dependent;
    results are not).

    At 100 TB: the z-ordered write is one range exchange over the
    Morton key; the index is one file-count-sized aggregate refreshed
    per ingestion batch; every multi-dimensional range query then
    opens only overlapping files — the scan cost tracks the
    selectivity, not the table size."""
    from etl_spark_spark.sinks.zorder import write_zordered
    from etl_spark_spark.sources.stats_index import indexed_read

    orders = table(
        spark,
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    root = _scratch_dir("zorder_scan")
    path = f"{root}/orders_z"
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], num_files=16)
    scan = indexed_read(
        spark,
        path,
        {"o_custkey": (10, 100), "o_totalprice": (50_000.0, 150_000.0)},
    )
    return scan.df.select("o_orderkey", "o_custkey", "o_totalprice")


def q_production_daily_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRODUCTION CYCLE end-to-end under one hash gate
    (reference utils_superdesconto.py:62-66 + etl_job.py:79-85):

    1. stage the POS feed z-ordered on (ship day, product) — the
       OPTIMIZE ZORDER layout an ingested feed converges to;
    2. two incremental runs (Jan 1995, then Feb 1995), each:
       stats-index-pruned date-window read (only files overlapping the
       window are OPENED — pinned n_files_read < n_files_total in
       tests/test_daily_loop.py) → superdesconto transform (best
       discounted sale per label + dimension joins, tagged with the
       window) → COW versioned MERGE on etiqueta;
    3. return the committed snapshot: Feb rows replaced matched
       labels, unmatched Jan rows survive (src_window says which).

    The oracle replays the same two windowed best-sale selections and
    the MERGE expansion (window-2 rows UNION ALL anti-joined window-1
    rows) in plain SQL — value-hash equality proves the z-order
    rewrite, the file skip + residual filter, the transform, and the
    MERGE are jointly lossless. Scale: every stage is the audited
    scale path (pipelines/daily_loop.py docstring)."""
    import datetime as dt

    from etl_spark_spark.pipelines.daily_loop import run_daily_loop, stage_feed

    root = _scratch_dir("production_loop")
    feed = f"{root}/pos_feed"
    target = f"{root}/best_sales"
    stage_feed(spark, sf_dir, feed)
    snap, _scans = run_daily_loop(
        spark,
        sf_dir,
        feed,
        target,
        windows=[
            (dt.date(1995, 1, 1), dt.date(1995, 1, 31), "w1"),
            (dt.date(1995, 2, 1), dt.date(1995, 2, 28), "w2"),
        ],
    )
    return snap.select(
        "etiqueta",
        "filial",
        "cod_prod",
        "periodo",
        "venda",
        "venda_desconto",
        "perc_dsc_cupom",
        "produto_nome",
        "produto_marca",
        "preco_tabela",
        "fornecedor_nome",
        "src_window",
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


def q_doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped LM scoring, one context order up from
    doc_surprisal: mean add-1-smoothed BIGRAM surprisal per document
    under corpus statistics — word-salad scores high even when its
    unigram mix looks normal; templated text scores low. Milli-nat
    integer output (operators/lm.py:bigram_surprisal)."""
    from etl_spark_spark.operators.lm import bigram_surprisal

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_surprisal(docs, "doc_id", "text")


def q_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented distribution-drift monitor: one exact KS D per
    event_type between the deterministic A/B user-hash halves of the
    value distribution — the per-segment form of ks_test_ab that
    catches a single feed shifting where the global statistic would
    dilute it. Per-group CDFs are plain group-partitioned windows over
    compact distributions (parallel by construction; no prefix-sum
    machinery needed), integer counts + exact-int divisions only
    (operators/stats.py:ks_drift_by_group)."""
    from etl_spark_spark.operators.stats import ks_drift_by_group

    ev = (
        read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                < "8",
                F.lit("A"),
            ).otherwise(F.lit("B")).alias("variant"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return ks_drift_by_group(ev, ["event_type"], "cents", "variant")


def q_join_mv_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view maintenance under UPDATES: batch 0 builds the Jan-Feb
    1995 orders⋈lineitem view; batch 1 delivers a correction feed that
    RETRACTS (mult -1) every order of custkey%5==0 customers and
    re-inserts it with status 'X' — the Z-set encoding of an UPDATE
    (streaming/join_mv.py:apply_join_batch_z). The consolidated view
    must equal the join against the corrected final state, which is
    exactly what the oracle computes (CASE-patched orders, COUNT(*) as
    the row multiplicity) — hash equality proves retraction algebra,
    the bilinear delta terms, and read-time consolidation jointly."""
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch_z,
        read_join_view_z,
    )

    root = _scratch_dir("join_mv_z")
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).withColumnRenamed("l_orderkey", "orderkey")
    orders = (
        table(
            spark, sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        )
        .withColumnRenamed("o_orderkey", "orderkey")
        .drop("o_orderdate")
    )
    corrected = orders.filter(F.col("o_custkey") % 5 == 0)
    retract = corrected.withColumn("__mult", F.lit(-1))
    reinsert = corrected.withColumn(
        "o_orderstatus", F.lit("X")
    ).withColumn("__mult", F.lit(1))
    empty_left = li.filter(F.lit(False))
    state = f"{root}/state"
    apply_join_batch_z(li, orders, 0, ["orderkey"], state)
    apply_join_batch_z(
        empty_left, retract.unionByName(reinsert), 1, ["orderkey"], state
    )
    view = read_join_view_z(spark, state)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return view.select(
        "orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        cents.alias("price_cents"),
        F.col("mult").cast("long").alias("mult"),
    )


def q_compacted_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE under the hash gate: run the merge_upsert MERGE
    sequence, then COMPACT the committed snapshot (compact_table with
    order_by — few range-clustered files sorted on the merge key,
    published as one more CAS commit) and return the compacted
    snapshot. The oracle is the same MERGE expansion as q_merge_upsert,
    so hash equality proves compaction is row-for-row lossless while
    the layout becomes stats-discriminating; the pre-compaction
    version stays time-travelable and a racing merge makes the CAS
    refuse (both pinned in tests/test_sinks.py). This is the
    small-files maintenance pass every ingesting table needs — a
    thousand tiny MERGE outputs otherwise destroy scan throughput."""
    from etl_spark_spark.sinks.versioned import (
        compact_table,
        merge_into_versioned,
        read_versioned,
    )

    cust = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    target0 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        cents.alias("acctbal_cents"),
        F.lit(0).alias("batch"),
    )
    source = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (cents + F.lit(10_000)).alias("acctbal_cents"),
        F.lit(1).alias("batch"),
    )
    root = _scratch_dir("compacted_snapshot")
    merge_into_versioned(spark, target0, root, ["c_custkey"])
    merge_into_versioned(spark, source, root, ["c_custkey"])
    compact_table(
        spark, root, target_file_bytes=32 * 1024, order_by=["c_custkey"]
    )
    return read_versioned(spark, root).select(
        "c_custkey", "c_name", "acctbal_cents", "batch"
    )


def q_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance under the hash gate: the
    Jan-Feb 1995 orders⋈lineitem view is built by THREE insert
    micro-batches through the bilinear delta rule
    ΔV = ΔL⋈R_prev ∪ L_prev⋈ΔR ∪ ΔL⋈ΔR (streaming/join_mv.py) — the
    view is never recomputed, each batch appends exactly its delta
    partition. Batches slice the two sides INDEPENDENTLY (lineitem by
    supplier mod 3, orders by customer mod 3) so ~2/3 of all matches
    straddle batches — the cross-batch terms carry real weight. The
    oracle is the plain one-shot join, so hash equality proves the
    fold reconstructs it exactly."""
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch,
        read_join_view,
    )

    root = _scratch_dir("join_mv")
    li = table(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    ).withColumnRenamed("l_orderkey", "orderkey")
    orders = (
        table(
            spark,
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        )
        .withColumnRenamed("o_orderkey", "orderkey")
        .drop("o_orderdate")
    )
    for b in range(3):
        apply_join_batch(
            li.filter(F.col("l_suppkey") % 3 == b),
            orders.filter(F.col("o_custkey") % 3 == b),
            b,
            ["orderkey"],
            f"{root}/state",
        )
    view = read_join_view(spark, f"{root}/state")
    return view.select(
        "orderkey",
        "l_linenumber",
        "l_suppkey",
        "o_custkey",
        "o_orderstatus",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("revenue_cents"),
    )


def q_join_mv_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL join-view maintenance with BOUNDED state under the
    hash gate (round-7): views⋈purchases per user within a 1-hour
    event-time band, folded as THREE time-ordered micro-batches
    (10-day windows) through the banded delta rule
    (streaming/join_mv.py apply_join_batch_temporal). Between batches
    1 and 2 the maintenance loop EVICTS every accumulated-side
    partition whose manifest max event time sits behind
    watermark − band (evict_join_mv_state — whole-directory deletes,
    the view untouched); the oracle is the one-shot banded join over
    ALL events, so hash equality proves eviction dropped only state
    that could never join again. This is the form whose state size
    tracks the band window, not the stream's lifetime — the property
    an unbounded 100 TB stream requires (the pure equi-join MV must
    keep full history by construction)."""
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch_temporal,
        evict_join_mv_state,
    )

    root = _scratch_dir("join_mv_temporal")
    state = f"{root}/state"
    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cuts = ["2024-01-11", "2024-01-21"]
    windows = [
        (None, cuts[0]),
        (cuts[0], cuts[1]),
        (cuts[1], None),
    ]

    def _slice(df: DataFrame, ts: str, lo: str | None, hi: str | None):
        out = df
        if lo is not None:
            out = out.filter(F.col(ts) >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            out = out.filter(F.col(ts) < F.lit(hi).cast("timestamp"))
        return out

    for b, (lo, hi) in enumerate(windows):
        if b == 2:
            # maintenance: batches 0-1 are checkpoint-committed; the
            # watermark is ~Jan 20, so batch 0 (max ts < Jan 11) sits
            # behind watermark − 1h and its partitions are dropped —
            # bounded state, proven lossless by the oracle below
            evicted = evict_join_mv_state(
                state, band_seconds=3600, committed_below=2
            )
            if not {("left", 0), ("right", 0)} <= set(evicted):
                raise AssertionError(
                    f"expected batch-0 state eviction, got {evicted}"
                )
        apply_join_batch_temporal(
            _slice(views, "view_ts", lo, hi),
            _slice(purchases, "purchase_ts", lo, hi),
            b,
            ["user_id"],
            "view_ts",
            "purchase_ts",
            band_seconds=3600,
            state_path=state,
        )
    view = spark.read.parquet(f"{state}/view").drop("__batch_id")
    return view.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        F.round(F.col("purchase_value") * 100)
        .cast("long")
        .alias("purchase_cents"),
    )


def q_text_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-format round trip under the hash gate: customer is
    written to CSV and orders to JSON-lines (the two text formats a
    real feed arrives in), read back through the engine's
    schema-contract readers (``sources.text_formats`` — explicit
    schema, no inference pass, malformed-row policy), joined, and
    aggregated to per-(mktsegment, orderstatus) integer-cents revenue.
    The oracle computes the same aggregate from the PARQUET originals,
    so value-hash equality proves the CSV and JSONL write→read cycles
    preserved every key, every double (shortest-roundtrip repr), and
    every timestamp that survives into the result — quoting, NULL, or
    type-inference drift anywhere breaks the gate. Scratch lives in
    the per-process atexit-cleaned dir."""
    from etl_spark_spark.sources.text_formats import read_csv, read_jsonl

    root = _scratch_dir("text_formats")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cust.write.mode("overwrite").option("header", "true").csv(f"{root}/cust_csv")
    orders.write.mode("overwrite").json(f"{root}/orders_jsonl")
    cust_rt = read_csv(
        spark,
        f"{root}/cust_csv",
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
        mode="FAILFAST",
    )
    orders_rt = read_jsonl(
        spark,
        f"{root}/orders_jsonl",
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
        mode="FAILFAST",
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders_rt.filter(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
        )
        .join(cust_rt, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(cents) / 100.0).alias("revenue"),
        )
    )


def q_doc_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix MATERIALIZATION — the step after q_doc_budget_mix's
    arithmetic: Hamilton-apportion a 300-doc budget across
    (source, lang) strata, then actually PICK each stratum's quota
    (content-addressed md5 rank — reproducible, no RNG) and emit the
    mix in its deterministic epoch order (epoch_shuffle position).
    This is the complete "compose the training set" pass: exact
    integer quotas that sum to the budget, engine-portable selection,
    and a resumable global order, one hash gate over all three.

    Scale: quota math runs on the strata table (rows = #strata); the
    per-stratum pick is one ranking window partitioned by stratum
    (each partition sorts only its stratum); the epoch order is the
    bucketed prefix-sum rank — no single-task sort anywhere."""
    from etl_spark_spark.operators.sampling import (
        apportion_budget,
        epoch_shuffle,
    )

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "source", "lang"])
    counts = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("stratum", F.concat_ws("|", "source", "lang"))
    )
    alloc = apportion_budget(counts, "stratum", "n_docs", 300).select(
        "source", "lang", "alloc"
    )
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    picked = (
        docs.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(alloc), ["source", "lang"])
        .filter(F.col("rn") <= F.col("alloc"))
        .select("doc_id", "source", "lang")
    )
    return epoch_shuffle(picked, "doc_id", seed=0)


def q_doc_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: the reproducible global training
    order over the corpus — position = exact global rank under
    md5(seed#doc_id), computed by the distributed prefix-sum rank
    (256 parallel hash buckets + one 256-row offset window; no
    single-task global sort). Re-runs, resumes, and other engines all
    agree on what example N was; seed bumps give fresh epoch
    permutations (operators/sampling.py:epoch_shuffle)."""
    from etl_spark_spark.operators.sampling import epoch_shuffle

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "source"])
    return epoch_shuffle(docs, "doc_id", seed=0)


def q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance matrix of the embedding corpus — the
    sufficient-statistics pass before whitening/PCA/OPQ rotation
    training. Components are fixed-point-quantized once (micro), all
    sums integer-exact (decimal/HUGEINT), and each of the d(d+1)/2
    upper-triangle cells ends in ONE IEEE division on identical exact
    inputs — bit-stable under any partitioning, full value-hash
    oracle. Cell products are generated map-side from each row's
    array (no self-join) and combine into the constant-size cell
    table before any exchange
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


def q_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): every document scored
    by how much more likely its md5-hashed bigram buckets are under
    the target-domain bag model (the ``source = 'src0'`` slice plays
    the curated domain) than under the raw corpus — the "select crawl
    that looks like the target" pass a 100 TB curation pipeline runs
    before training. Hashed-bucket tables are constant-sized (≤ 65k
    rows) whatever the corpus size; milli-nat quantization makes the
    ln fold bit-stable cross-engine
    (operators/lm.py:dsir_log_weights)."""
    from etl_spark_spark.operators.lm import dsir_log_weights

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text", "source"])
    return dsir_log_weights(
        docs, "doc_id", "text", F.col("source") == "src0"
    )


def q_cluster_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup RESOLUTION: MinHash-LSH pairs (exact-verified
    >= 0.5) -> connected components -> keep the LONGEST doc per
    cluster (ties to the highest id) — the "which copy do we train
    on" decision every curation pipeline makes after pair detection;
    min-id canonicals (doc_exact_dedup) keep an arbitrary copy,
    this keeps the most complete one. Singleton docs are their own
    kept canonical, so the output is the full keep-list:
    (cluster_id, kept_doc_id, n_members).

    Scale: the pair stage is the collapsed banded-LSH path (sub-
    quadratic, no set arrays); components propagate labels over
    DISTINCT-SET rep pairs only (operators/neardup.py:
    near_dup_clusters — the doc-level edge list is quadratic in twin
    multiplicity and starved an 8 GB executor at the 100x replica;
    the rep graph is diversity-sized and members inherit labels in one
    join, provably the same clusters); the keep choice is one ranking
    window per cluster (bounded groups). The oracle replays the
    banded algorithm + a recursive reach CTE over DOC-level pairs +
    the same window — value-hash equality at sf0.01 is exactly the
    collapse-equivalence proof, checked every round."""
    from etl_spark_spark.operators.neardup import near_dup_clusters

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    toks = docs.select("doc_id", tokens("text").alias("t"))
    clusters = near_dup_clusters(
        toks, "doc_id", word_shingles("t", 3), num_perms=8,
        rows_per_band=2, threshold=0.5,
    )
    full = (
        docs.select("doc_id", "n_chars")
        .join(clusters.withColumnRenamed("doc_id", "__cd"),
              F.col("doc_id") == F.col("__cd"), "left")
        .select(
            "doc_id",
            "n_chars",
            # shingle-less docs (< 3 tokens) never enter the pair
            # machinery; they are their own cluster
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").desc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        full.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("kept_doc_id"), "n_members")
    )


def q_events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward): every event
    carries the user's most recent purchase value — the IGNORE NULLS
    running last_value, the window feature none of the other window
    queries exercise. One shuffle (the per-user window); no self-join,
    no driver state. Total order pinned by (ts, event_id) so the fill
    frontier is identical on both engines."""
    events = read_events(spark, sf_dir)
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(purchase_val, ignorenulls=True)
        .over(w)
        .alias("last_purchase_value"),
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-dup pairs (MinHash+LSH,
    exact-Jaccard verified >= 0.5) whose members landed in DIFFERENT
    content-addressed splits — the pairs an eval-set decontamination
    pass must remove before benchmark numbers mean anything. Split
    membership is recomputed from each pair id as a pure expression
    (the same md5 rule hash_split uses), so the audit adds ZERO joins
    on top of the LSH pair generation — at 100 TB the pair set is the
    small output, and nothing rejoins the corpus."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    pairs = near_dup_minhash(
        toks, "doc_id", word_shingles("t", 3), num_perms=8,
        rows_per_band=2, threshold=0.5,
    )

    def split_of(c: str):
        b = F.substring(F.md5(F.col(c).cast("string")), 1, 1)
        return (
            F.when(b < "d", F.lit("train"))
            .when(b < "f", F.lit("val"))
            .otherwise(F.lit("test"))
        )

    return (
        pairs.withColumn("split_a", split_of("id_a"))
        .withColumn("split_b", split_of("id_b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


def q_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed iterative PageRank (5 exact fixed-point iterations)
    over the customer<->supplier trade graph (distinct order-derived
    pairs, both directions, so the walk mixes). The ONLY iterative
    numeric algorithm family in the suite beyond label propagation —
    and because the recurrence is pure integer arithmetic
    (operators/graph.py:pagerank_exact), even this has a bit-exact SQL
    oracle (5 unrolled CTE stages). Output restricted to the supplier
    side of the bipartite graph. ``rank`` is rank_fp/scale — both
    operands exactly representable, so the IEEE division is identical
    on both engines (no rounding needed, none applied)."""
    from etl_spark_spark.operators.graph import pagerank_exact

    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    ranks = pagerank_exact(edges, iters=5)
    return ranks.filter(F.col("node").startswith("S")).select(
        "node", "rank_fp", "rank"
    )


def q_supplier_co_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection (co-occurrence mining): suppliers linked by
    the number of 1995 customers they share — the item-item shape
    behind co-purchase / co-citation / co-click graphs. One distinct
    edge list, self-joined per customer with s1 < s2, aggregated per
    pair; kept pairs need >= 3 shared customers. Scale note: pair fanout
    is sum(deg_c^2) over customers — bounded here (a customer touches
    few suppliers); for power-law degree data cap or sample per-key
    like doc_source_cap does, because one hub customer is a quadratic
    bomb."""
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    a = edges.alias("a")
    b = edges.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"),
            F.col("b.l_suppkey").alias("supp_b"),
        )
        .agg(F.count("*").alias("shared_customers"))
        .filter(F.col("shared_customers") >= 3)
    )


def q_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle membership in the 1995 co-purchase graph
    (pairs sharing >= 5 customers) via degree-ordered wedge joins
    (operators/graph.py:triangle_counts). The orientation caps every
    node's wedge fanout at O(sqrt(m)) regardless of hubs — the property
    that keeps the self-join alive on power-law graphs; the oracle
    enumerates triangles with a brute 3-way join instead."""
    from etl_spark_spark.operators.graph import triangle_counts

    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    bip = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    a = bip.alias("a")
    b = bip.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 5)
        .select("src", "dst")
    )
    return triangle_counts(edges, "src", "dst").withColumnsRenamed(
        {"node": "suppkey"}
    )


def q_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: peak number of simultaneously-active
    user sessions per hour. Sessions (30-min gap rule) become +1/-1
    boundary events; the concurrency curve is their running sum in
    global (ts, delta DESC, user, session) order — computed by the
    distributed prefix-sum operator (within-hour windows + a tiny
    cross-bucket offset), NOT a single-task global window; then max per
    hour. delta DESC at ties counts endpoint-touching sessions as
    concurrent, identically in the oracle."""
    from etl_spark_spark.operators.windows import scalable_running_sum
    from etl_spark_spark.streaming.windows import sessionize_batch

    ev = read_events(spark, sf_dir).select("user_id", "ts")
    sess = (
        sessionize_batch(ev, "ts", ["user_id"], 1800)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    bounds = sess.select(
        "user_id", "session_id", F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            "user_id", "session_id", F.col("e").alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    curve = scalable_running_sum(
        bounds,
        F.date_trunc("hour", "ts"),
        [F.col("ts"), F.col("delta").desc(), F.col("user_id"), F.col("session_id")],
        "delta",
        out_col="concurrency",
    )
    return (
        curve.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour"
            )
        )
        .agg(F.max("concurrency").cast("long").alias("peak_concurrency"))
    )


def q_global_spend_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL row_number for EVERY row — the ranking a naive
    Window.orderBy() serializes onto one task — via the distributed
    prefix-sum operator: running count of 1s in (spend DESC, custkey)
    order, bucketed by negated spend-cents decade so the bucket is
    monotone in the ordering. Every customer gets its exact global
    rank in parallel; ties break on custkey identically in the
    oracle."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    orders = table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("__cents")
    )
    ranked = scalable_running_sum(
        spend.withColumn("__one", F.lit(1)),
        -F.expr("__cents div 100000"),
        [F.col("__cents").desc(), F.col("o_custkey")],
        "__one",
        out_col="global_rank",
    )
    return ranked.select(
        "o_custkey",
        (F.col("__cents") / 100.0).alias("total_spend"),
        F.col("global_rank").cast("long").alias("global_rank"),
    )


def q_replica_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy replica comparison (Merkle-style): a 'replica' of
    customer with deterministic injected drift (every 97th key's
    balance bumped, every 131st key missing, every 113th key an extra
    synthetic row) is reconciled against the original by per-bucket
    count+XOR digests — one tiny aggregate per side — and ONLY the
    divergent buckets get a row-level full outer. The output is the
    repair plan: (key, left_only | right_only | modified). This is how
    you compare two 100 TB copies without shipping either."""
    from etl_spark_spark.operators.reconcile import bucket_scoped_diff

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    cust = table(spark, sf_dir, "customer", columns=cols)
    replica = (
        cust.filter(F.col("c_custkey") % 131 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 97 == 0,
                F.round(F.col("c_acctbal") + 1.0, 2),
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 113 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
            )
        )
    )
    return bucket_scoped_diff(cust, replica, "c_custkey", cols)


def q_customer_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document build + higher-order functions: each customer's
    orders become a SORTED array of (order_key, cents) structs — the
    denormalized 'document' layout columnar engines serve to APIs —
    then F.filter / F.exists / F.aggregate compute per-customer
    answers WITHOUT re-exploding (one aggregation shuffle total; the
    HOFs are codegen'd array folds). Struct array sorted by order_key
    so the build is deterministic; all money in integer cents."""
    orders = table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    docs = (
        orders.withColumn("__c", cents)
        .groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("o_orderkey").alias("k"),
                                        F.col("__c").alias("c")))
            ).alias("orders"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("long").alias("n_urgent"),
        )
    )
    big = F.filter("orders", lambda o: o["c"] > 30_000_00)
    return docs.select(
        "o_custkey",
        F.size("orders").alias("n_orders"),
        F.size(big).alias("n_big_orders"),
        F.exists("orders", lambda o: o["c"] > 50_000_00).alias("has_jumbo"),
        (
            F.aggregate(
                "orders", F.lit(0).cast("long"), lambda acc, o: acc + o["c"]
            )
            / 100.0
        ).alias("total_spend"),
        F.element_at("orders", 1)["k"].alias("first_order_key"),
        "n_urgent",
    )


def q_doc_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact training-mix apportionment: a 200-doc sample budget split
    across (source, lang) strata by largest-remainder (Hamilton)
    apportionment — integer allocations that sum EXACTLY to the budget
    (probabilistic temperature sampling can't promise that), remainder
    ties broken on the stratum key. All integer arithmetic; the window
    runs over the strata table, never the corpus."""
    from etl_spark_spark.operators.sampling import apportion_budget

    docs = table(spark, sf_dir, "documents", columns=["source", "lang"])
    counts = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("stratum", F.concat_ws("|", "source", "lang"))
    )
    return apportion_budget(counts, "stratum", "n_docs", 200).select(
        "source", "lang", "n_docs", "alloc"
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-and-aggregate scan — every
    predicate (date range, discount band, quantity cap) pushed to the
    parquet scan, zero joins, one exchange for the single-row global
    sum. The simplest query in the set and the sharpest pushdown test:
    if ANY of the three predicates misses PushedFilters, the scan reads
    10x the rows."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue_effect"
            ),
            F.count("*").alias("n_lines"),
        )
    )


def q_superdesconto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return best_sale_pipeline(spark, sf_dir)


def q_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return allocation_pipeline(spark, sf_dir)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table over each user's event
    sequence (ts, event_id total order): (from, to, n, p) with p the
    exact integer/integer share of the from-state
    (operators/grouped.py:transition_counts)."""
    from etl_spark_spark.operators.grouped import transition_counts

    ev = read_events(spark, sf_dir)
    return transition_counts(ev, "user_id", ["ts", "event_id"], "event_type")


def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of consecutive active calendar
    days via the day_number - row_number() island constant
    (operators/grouped.py:activity_streaks)."""
    from etl_spark_spark.operators.grouped import activity_streaks

    ev = read_events(spark, sf_dir)
    return activity_streaks(ev, "user_id", "ts")


def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed EXACT Welch two-sample t-test per event type
    between a deterministic 50/50 user hash split: integer-cents
    sufficient statistics (associative — bit-stable under any shuffle
    order), then a fixed IEEE double sequence the oracle mirrors
    term-for-term (operators/grouped.py:welch_t_test). The
    experimentation-analytics shape: at 100 TB it is one map-side-
    combinable aggregate, never a per-variant collect."""
    from etl_spark_spark.operators.grouped import welch_t_test

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            F.lit("A"),
        ).otherwise(F.lit("B")).alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return welch_t_test(ev, ["event_type"], "cents", "variant")


def q_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: per-class support / true-positives /
    predicted-count, precision, recall and F1 of the stopword-profile
    language identifier against the corpus's ``lang`` labels. Three
    hash aggregates + a full-outer join on the class; the ratios are
    exact integer/integer IEEE divisions mirrored by the oracle."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        F.col("lang").alias("actual"), lang_id("text").alias("pred")
    )
    act = d.groupBy("actual").agg(
        F.count("*").alias("support"),
        F.count(F.when(F.col("pred") == F.col("actual"), 1)).alias("tp"),
    )
    pred = d.groupBy(F.col("pred").alias("actual")).agg(
        F.count("*").alias("pred_n")
    )
    j = act.join(pred, "actual", "full").select(
        F.col("actual").alias("lang"),
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
    )
    prec = F.when(
        F.col("pred_n") > 0,
        F.col("tp").cast("double") / F.col("pred_n").cast("double"),
    )
    rec = F.when(
        F.col("support") > 0,
        F.col("tp").cast("double") / F.col("support").cast("double"),
    )
    return j.select(
        "lang",
        "support",
        "tp",
        "pred_n",
        prec.alias("prec"),
        rec.alias("rec"),
        F.when(
            prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)
        ).alias("f1"),
    )


def q_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every
    purchase's integer cents split 40/20/40 over its view/click touches
    in the prior 24 h (operators/asof.py:position_attribution — binned
    interval join + per-conversion windows; deterministic remainder
    placement makes every credit an exact integer, so the per-channel
    sums are bit-stable integer aggregation at any scale)."""
    from etl_spark_spark.operators.asof import position_attribution

    ev = read_events(spark, sf_dir)
    conversions = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros("ts").alias("conv_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.unix_micros("ts").alias("touch_us"),
    )
    credits = position_attribution(
        touches,
        conversions,
        keys=["user_id"],
        touch_id="touch_id",
        touch_ts_us="touch_us",
        conv_id="conv_id",
        conv_ts_us="conv_us",
        cents_col="cents",
        lookback_us=86_400_000_000,
    )
    return (
        credits.join(
            touches.select("touch_id", "touch_type"),
            F.col("__touch_id") == F.col("touch_id"),
        )
        .groupBy("touch_type")
        .agg(
            F.sum("attributed_cents").alias("attributed_cents"),
            F.count("*").alias("n_touch_credits"),
        )
    )


def q_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts not dominated on (size, retailprice) —
    maximal in both dimensions (operators/windows.py:pareto_frontier_2d,
    the distributed exclusive-prefix-max sweep; the oracle is the
    obviously-correct quadratic NOT EXISTS dominance test)."""
    from etl_spark_spark.operators.windows import pareto_frontier_2d

    part = table(
        spark, sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"]
    )
    return pareto_frontier_2d(part, "p_size", "p_retailprice")


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction over the corpus: per mid-frequency
    term (2 <= df <= 40), the document frequency, total term count,
    and the sorted posting list serialized as CSV (arrays leave as
    strings — the driver canonicalizer can't sort list cells). Explode
    + two hash aggregates; posting lists stay bounded by the df cap."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    per_doc = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings_csv"),
        )
        .filter((F.col("df") >= 2) & (F.col("df") <= 40))
    )


def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed leading-digit
    shares vs the Benford expectation — the forensic data-quality
    screen for fabricated numeric columns. Counts are exact integers;
    the expected shares are Python-computed literals embedded
    identically in both engines, so every double matches bitwise."""
    import math

    orders = table(spark, sf_dir, "orders", columns=["o_totalprice"])
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    )
    counts = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == str(d), F.lit(math.log10(1 + 1 / d))
        ).otherwise(expected)
    total = counts.agg(F.sum("n").alias("__total"))
    share = F.col("n").cast("double") / F.col("__total").cast("double")
    counts = counts.crossJoin(F.broadcast(total))
    return counts.select(
        "digit",
        "n",
        share.alias("share"),
        expected.alias("expected"),
        F.abs(share - expected).alias("abs_dev"),
    )


def q_exact_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quartiles (no approx_percentile error bound, no
    global sort): distribution aggregate + one per-group window over
    distinct values (operators/stats.py:exact_group_quantiles); the
    smallest-v-with-cum>=ceil(q*n) semantics are pinned by a plain-SQL
    window oracle, not an engine quantile builtin."""
    from etl_spark_spark.operators.stats import exact_group_quantiles

    li = table(
        spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"]
    )
    return exact_group_quantiles(
        li, ["l_returnflag"], "l_extendedprice", qs=(0.25, 0.5, 0.75)
    )


def q_ks_test_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov D between the A/B user-hash
    purchase-value distributions — the distribution-free counterpart
    to ab_test_welch. CDFs evaluated at every distinct cents value via
    the distributed prefix-sum decomposition (bucketed by cents/1000,
    so the serial window sees only bucket totals)
    (operators/stats.py:ks_two_sample)."""
    from etl_spark_spark.operators.stats import ks_two_sample

    ev = read_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            F.lit("A"),
        ).otherwise(F.lit("B")).alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ks_two_sample(
        ev, "cents", "variant", bucket=F.expr("cents div 1000")
    )


def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4):
    parse_json once, variant_get typed extraction, then aggregate —
    the open-schema path when JSON payloads are too heterogeneous for
    a fixed struct (the MapType companion query pins the closed-schema
    path). Oracle: DuckDB JSON extraction of the same field."""
    ev = read_events(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


def q_pyds_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource (partition-parallel
    pure-Python reader, sources/pydatasource.py): 5000 synthetic rows
    in 8 planned slices, aggregated per source. The oracle regenerates
    the corpus with SQL range() + the same integer arithmetic — the
    whole custom-connector read path is value-checked."""
    from etl_spark_spark.sources.pydatasource import register_synthdocs

    register_synthdocs(spark)
    df = (
        spark.read.format("synthdocs")
        .option("rows", 5000)
        .option("parts", 8)
        .load()
    )
    return df.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars_sum"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
    )


def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean event value per user: each event's value
    holds until the user's next event (sampled-state semantics — the
    right mean for irregular time series, where the plain mean
    over-weights bursts). Weighted sums are exact integer
    cents x microseconds in decimal(38,0); the final division is the
    usual oracle-mirrored exact-int IEEE step."""
    from pyspark.sql import Window as W

    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.col("event_id"),
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    seg = ev.withColumn("next_us", F.lead("us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    s = seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("next_us") - F.col("us")).alias("active_us"),
        F.sum(
            (F.col("cents") * (F.col("next_us") - F.col("us"))).cast(
                "decimal(38,0)"
            )
        ).alias("wsum"),
    )
    return s.select(
        "user_id",
        "n_segments",
        "active_us",
        (
            F.col("wsum").cast("double")
            / F.col("active_us").cast("double")
        ).alias("tw_cents"),
    )


def q_monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue report: per-month integer-cents totals
    (one hash aggregate over the fact), then lag/delta/pct over the
    TINY month table — the serial window is sized by the number of
    months, never the fact row count."""
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]
    )
    from pyspark.sql import Window as W

    monthly = (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("month")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    w = W.orderBy("month")
    return monthly.select(
        "month",
        "revenue_cents",
        F.lag("revenue_cents").over(w).alias("prev_cents"),
        (
            F.col("revenue_cents") - F.lag("revenue_cents").over(w)
        ).alias("delta_cents"),
        (
            (
                F.col("revenue_cents") - F.lag("revenue_cents").over(w)
            ).cast("double")
            / F.lag("revenue_cents").over(w).cast("double")
        ).alias("mom_pct"),
    )


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory analysis: parts ranked by revenue, classified by
    cumulative revenue share (A < 80%, B < 95%, C rest). The cumulative
    sum over the revenue-descending global order runs through the
    distributed prefix-sum decomposition bucketed by revenue band —
    the one serial window sees only band totals
    (operators/windows.py:scalable_running_sum)."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    li = table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"]
    )
    rev = (
        li.select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    cum = scalable_running_sum(
        rev,
        -F.expr("revenue_cents div 100000000"),
        [F.col("revenue_cents").desc(), F.col("l_partkey")],
        "revenue_cents",
        out_col="cum_cents",
    )
    total = rev.agg(F.sum("revenue_cents").alias("__total"))
    share = F.col("cum_cents").cast("double") / F.col("__total").cast("double")
    return cum.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "revenue_cents",
        "cum_cents",
        share.alias("cum_share"),
        F.when(share < 0.8, F.lit("A"))
        .when(share < 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup->first-purchase latency, exact quartiles per signup-day
    cohort: two min-aggregates (first signup, first purchase at or
    after it), then operators/stats.py:exact_group_quantiles over the
    integer-microsecond latencies — funnel timing analytics with no
    approx-percentile error."""
    from etl_spark_spark.operators.stats import exact_group_quantiles

    ev = read_events(spark, sf_dir)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("signup_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    conv = (
        signups.join(purchases, "user_id")
        .filter(F.col("p_us") >= F.col("signup_us"))
        .groupBy("user_id", "signup_us")
        .agg(F.min("p_us").alias("first_purchase_us"))
        .select(
            F.date_format(
                F.timestamp_micros(F.col("signup_us")), "yyyy-MM-dd"
            ).alias("cohort_day"),
            (F.col("first_purchase_us") - F.col("signup_us")).alias(
                "latency_us"
            ),
        )
    )
    return exact_group_quantiles(conv, ["cohort_day"], "latency_us")


def q_part_cooccurrence_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering scores: parts co-ordered by
    the same customer, scored by cosine over the customer-incidence
    vectors — shared / sqrt(n_a * n_b), the association normalization
    that makes hub items comparable to niche ones. Exact integer
    inputs; pairs need >= 3 shared customers (the support floor that
    also bounds the pair fanout).

    Hub-basket cap (standard co-occurrence practice): customers with
    more than MAX_BASKET distinct parts are dropped BEFORE the pair
    self-join — the per-key pair fanout is quadratic in basket size,
    so one reseller account with 1e5 parts would otherwise generate
    5e9 pairs on a single join key at 100x scale. The size filter is
    a count window over the incidence partitioned by o_custkey: ONE
    pass over a single incidence lineage (an aggregate + anti-join
    formulation recomputes the lineitem-orders join for the hub set),
    and it leaves the capped incidence already hash-partitioned by
    the self-join key. The degree normalization uses the SAME capped
    incidence so cosine stays internally consistent. Documented bias:
    hub baskets carry near-zero association signal per pair anyway
    (see scripts/bench_skew.py replica numbers in BASELINE.md)."""
    max_basket = 200
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    orders = table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    inc_all = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    wb = Window.partitionBy("o_custkey")
    inc = (
        inc_all.withColumn("__bsz", F.count("*").over(wb))
        .filter(F.col("__bsz") <= max_basket)
        .drop("__bsz")
    )
    deg = inc.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = inc.alias("a")
    b = inc.alias("b")
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


def q_chi2_type_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (event type x A/B variant) with
    Cramér's V — the categorical counterpart to ab_test_welch. Every
    per-cell contribution is an exact-integer IEEE division, and the
    cross-cell sum folds a SORTED cell array sequentially
    (F.aggregate, mirrored by the oracle's list_reduce) so the float
    total is bit-identical regardless of partitioning — a parallel
    float SUM() would be order-dependent."""
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            F.lit("A"),
        ).otherwise(F.lit("B")).alias("variant"),
    )
    cells = ev.groupBy("event_type", "variant").agg(
        F.count("*").alias("o")
    )
    rows_t = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_t = cells.groupBy("variant").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("N"),
        F.count_distinct("event_type").alias("n_rows"),
        F.count_distinct("variant").alias("n_cols"),
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    j = (
        cells.join(rows_t, "event_type")
        .join(F.broadcast(cols_t), "variant")
        .crossJoin(F.broadcast(tot))
    )
    # cast each FACTOR to decimal BEFORE multiplying: o*N and N*r*c in
    # long overflow once counts reach ~1e7 (N*r*c ~ 1e21 at the 100x
    # replica — found by the full-registry 100x sweep). The squared
    # numerator is NEVER materialized in decimal (num^2 <= N^4 would
    # halve the safe exponent to N ~ 3e9 and Spark's non-ANSI decimal
    # overflow is a silent NULL): contrib factors as (num/den)*num
    # over correctly-rounded decimal->double casts — three IEEE ops,
    # mirrored operation-for-operation by the oracle, exact-input
    # bounds num <= N^2 < 1e38 (always) and den = N*r*c <= N^3 < 1e38
    # (N < 4.6e12 events — beyond 100 TB row counts).
    num = (
        dec(F.col("o")) * dec(F.col("N"))
        - dec(F.col("r")) * dec(F.col("c"))
    ).cast("double")
    den = (
        dec(F.col("N")) * dec(F.col("r")) * dec(F.col("c"))
    ).cast("double")
    contrib = (num / den) * num
    folded = j.select(
        F.concat_ws("|", "event_type", "variant").alias("k"),
        contrib.alias("ct"),
        "N",
        "n_rows",
        "n_cols",
    ).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("k", "ct"))),
            F.lit(0.0),
            lambda acc, x: acc + x.getField("ct"),
        ).alias("chi2"),
        F.max("N").alias("n"),
        F.max("n_rows").alias("n_rows"),
        F.max("n_cols").alias("n_cols"),
    )
    return folded.select(
        "n",
        "chi2",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n")
                * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
            ).cast("double")
        ).alias("cramers_v"),
    )


def q_customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — concentration analytics
    with the exact rank-weighted formula G = (2*sum(i*x_i) - (n+1)*
    sum(x)) / (n*sum(x)) over ascending spend. The global rank comes
    from the distributed prefix-sum (never a single-task window), the
    rank-weighted sum is exact decimal, and only the final division is
    float — one deterministic row."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    orders = table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    ranked = scalable_running_sum(
        spend.withColumn("__one", F.lit(1)),
        F.expr("cents div 100000"),
        [F.col("cents"), F.col("o_custkey")],
        "__one",
        out_col="rk",
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(dec(F.col("rk") * F.col("cents"))).alias("six"),
    )
    return s.select(
        "n",
        "sx",
        (
            (
                F.lit(2) * dec(F.col("six"))
                - dec((F.col("n") + 1)) * dec(F.col("sx"))
            ).cast("double")
            / (dec(F.col("n")) * dec(F.col("sx"))).cast("double")
        ).alias("gini"),
    )


_SUPPLIER_TRIANGLES_SQL = """
WITH bip AS (
  SELECT DISTINCT o_custkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1996-01-01'
), g AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM bip a JOIN bip b
    ON a.o_custkey = b.o_custkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 5
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM g e1
  JOIN g e2 ON e2.u = e1.u AND e1.v < e2.v
  JOIN g e3 ON e3.u = e1.v AND e3.v = e2.v
), members AS (
  SELECT x AS suppkey FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT suppkey, count(*) AS n_triangles FROM members GROUP BY suppkey
"""


_EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_state
  FROM events
), c AS (
  SELECT from_state, to_state, count(*) AS n
  FROM s WHERE to_state IS NOT NULL GROUP BY 1, 2
)
SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p
FROM c
"""

_USER_ACTIVITY_STREAKS_SQL = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
g AS (
  SELECT user_id, day,
         (day - DATE '1970-01-01')
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM s GROUP BY user_id
"""

# mirrors welch_t_test's IEEE sequence term-for-term; int -> double via
# VARCHAR (strtod is correctly rounded, matching Spark's decimal->double)
_AB_TEST_WELCH_SQL = """
WITH d AS (
  SELECT event_type,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(round(value * 100) AS HUGEINT) AS x
  FROM events
), s AS (
  SELECT event_type,
         count(*) FILTER (variant = 'A') AS n_a,
         count(*) FILTER (variant <> 'A') AS n_b,
         coalesce(sum(x) FILTER (variant = 'A'), 0) AS sa,
         coalesce(sum(x) FILTER (variant <> 'A'), 0) AS sb,
         coalesce(sum(x * x) FILTER (variant = 'A'), 0) AS ssa,
         coalesce(sum(x * x) FILTER (variant <> 'A'), 0) AS ssb
  FROM d GROUP BY event_type
), c AS (
  SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(CAST(sa AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
         CAST(CAST(sb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
         CAST(CAST(n_a * ssa - sa * sa AS VARCHAR) AS DOUBLE)
           / CAST(n_a * (n_a - 1) AS DOUBLE) AS var_a,
         CAST(CAST(n_b * ssb - sb * sb AS VARCHAR) AS DOUBLE)
           / CAST(n_b * (n_b - 1) AS DOUBLE) AS var_b
  FROM s
), e AS (
  SELECT event_type, n_a, n_b, mean_a, mean_b,
         var_a / CAST(n_a AS DOUBLE) AS se_a,
         var_b / CAST(n_b AS DOUBLE) AS se_b
  FROM c
)
SELECT event_type, n_a, n_b, mean_a, mean_b,
       (mean_a - mean_b) / sqrt(se_a + se_b) AS t_stat,
       ((se_a + se_b) * (se_a + se_b))
         / ((se_a * se_a) / CAST(n_a - 1 AS DOUBLE)
            + (se_b * se_b) / CAST(n_b - 1 AS DOUBLE)) AS welch_df
FROM e WHERE n_a > 1 AND n_b > 1
"""



_MULTI_TOUCH_ATTRIBUTION_SQL = """
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
         epoch_us(ts) AS tts
  FROM events WHERE event_type IN ('view', 'click')
), paired AS (
  SELECT c.conv_id, c.cents, t.touch_id, t.touch_type, t.tts
  FROM conv c JOIN t ON c.user_id = t.user_id
  WHERE t.tts BETWEEN c.cts - 86400000000 AND c.cts - 1
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_id ORDER BY tts, touch_id) AS rn,
         CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
  FROM paired
), credit AS (
  SELECT touch_type,
         CASE WHEN n = 1 THEN cents
              WHEN n = 2 THEN CASE WHEN rn = 1 THEN cents - cents // 2
                                   ELSE cents // 2 END
              WHEN rn = 1 THEN cents - (cents * 40 // 100) - (cents * 20 // 100)
              WHEN rn = n THEN cents * 40 // 100
              ELSE (cents * 20 // 100) // (n - 2)
                   + CASE WHEN rn - 1 <= (cents * 20 // 100) % (n - 2)
                          THEN 1 ELSE 0 END
         END AS ac
  FROM r
)
SELECT touch_type,
       CAST(sum(ac) AS BIGINT) AS attributed_cents,
       CAST(count(*) AS BIGINT) AS n_touch_credits
FROM credit GROUP BY touch_type
"""




def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Lucene's default scorer) for a literal
    query over the corpus — curation forensics ("which docs dominate
    this query?"). Map-only tf via array filters (no explode), 1-row
    corpus-stats broadcast, TakeOrderedAndProject top-k; scores are
    micro-scaled ints so JVM-vs-libm ln ulp noise can't break the
    oracle (operators/retrieval.py)."""
    from etl_spark_spark.operators.retrieval import bm25_topk

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=15)


_BM25_TERMS = ["hash", "join", "stream"]


def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: mean unigram surprisal of every
    document under token statistics trained on the corpus itself —
    high = gibberish/OCR noise, low = boilerplate. Milli-nat integer
    output (operators/lm.py)."""
    from etl_spark_spark.operators.lm import unigram_surprisal

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_surprisal(docs, "doc_id", "text")


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication audit (suffix-array-dedup stand-in):
    per doc, the fraction of its 8-token spans shared with other docs —
    the boilerplate/templated-spam strip signal. Spans travel as md5
    digests only (operators/neardup.py:duplicate_span_stats)."""
    from etl_spark_spark.operators.neardup import duplicate_span_stats

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select("doc_id", tokens("text").alias("__tok"))
    return duplicate_span_stats(tok, "doc_id", word_shingles("__tok", 8))


def q_mann_whitney_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) A/B test on purchase values with tie
    correction — the nonparametric sibling of ab_test_welch/ks_test_ab,
    same deterministic variant split. Integer rank statistics from a
    distribution aggregate + distributed prefix sum; z is IEEE-exact
    (sqrt only — no transcendentals) (operators/stats.py)."""
    from etl_spark_spark.operators.stats import mann_whitney_u

    ev = table(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    d = ev.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return mann_whitney_u(d, "cents", "variant", variant_a="A")


def q_supplier_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS (hop-bounded reachability) over the supplier
    co-purchase graph: how far supplier 1's influence reaches within 3
    hops. Frontier-expansion joins, one shuffle per hop, pinned by a
    bounded-depth recursive-CTE oracle (operators/graph.py:bfs_hops)."""
    from etl_spark_spark.operators.graph import bfs_hops

    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    bip = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    a, b = bip.alias("a"), bip.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    return bfs_hops(edges, F.lit(1).cast("long"), max_hops=3)


def q_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy profile of categorical columns across two tables
    (order status/priority, document lang/source) — the degenerate-
    feature / label-drift screen. One unpivot scan per table, micro-nat
    integer entropy (functions/profile.py:categorical_entropy)."""
    from etl_spark_spark.functions.profile import categorical_entropy

    orders = table(
        spark, sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"]
    )
    docs = table(spark, sf_dir, "documents", columns=["lang", "source"])
    return categorical_entropy(
        orders, ["o_orderstatus", "o_orderpriority"]
    ).unionByName(categorical_entropy(docs, ["lang", "source"]))


def q_priority_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode-priority two-level aggregate, keyed on
    l_linestatus since this dataset carries no shipmode): lines shipped
    in 1995, conditional counts of urgent/high vs lower order
    priorities per status. Join prunes to 3 columns; CASE-sum partial
    aggregates map-side."""
    li = table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    ).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished multi-supplier orders, suppliers whose lineitem shipped
    late (>60 days after order date) while EVERY other supplier shipped
    on time. The exists/not-exists pair is expressed as one per-(order,
    supplier) aggregate + one per-order aggregate — two hash shuffles
    on keys that can't skew, instead of correlated subqueries."""
    li = table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).filter(F.col("o_orderstatus") == "F")
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("long")
    per_os = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("late").alias("n_late")
    )
    waiting = per_os.filter(F.col("late") == 1).join(
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
        "l_orderkey",
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def q_mv_routed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view routing (plans/mv.py): revenue by returnflag
    answered from a (returnflag, linestatus, ship_year) additive rollup
    instead of rescanning lineitem — the router re-aggregates integer
    partial states, so the answer is bit-identical to the base-table
    aggregate the oracle computes. The routing decision itself is
    pinned by tests/test_mv.py."""
    from etl_spark_spark.plans.mv import answer, materialize_rollup

    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).withColumn(
        "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).withColumn("ship_year", F.year("l_shipdate"))
    measures = {
        "revenue_cents": ("revenue", "sum_cents"),
        "n_lines": (None, "count"),
    }
    view = materialize_rollup(
        li, "rf_ls_year", ["l_returnflag", "l_linestatus", "ship_year"], measures
    )
    routed, source = answer(
        [view], lambda: li, ["l_returnflag"], measures
    )
    assert source == "rf_ls_year"  # must not fall back to a base scan
    return routed


def q_cumulative_new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-acquisition curve: per month, first-time customers and
    the running total of customers acquired so far. First-order month
    via one hash aggregate; the running total uses the distributed
    prefix-sum decomposition (year bucket), not a single-task global
    window."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    orders = table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    )
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("month")
    )
    monthly = first.groupBy("month").agg(F.count("*").alias("n_new"))
    out = scalable_running_sum(
        monthly,
        F.substring("month", 1, 4),
        ["month"],
        "n_new",
        out_col="cum_customers",
    )
    return out.select("month", "n_new", "cum_customers")


def q_order_value_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions (percent_rank + cume_dist):
    where every 1995-H1 order sits inside its month's value
    distribution. Both statistics are exact integer-ratio divisions —
    bit-stable at any parallelism. One shuffle on the month key."""
    orders = table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
    )
    w = Window.partitionBy(
        F.date_format("o_orderdate", "yyyy-MM")
    ).orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


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


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("hash join" as ADJACENT tokens —
    what bag-of-words BM25 can't distinguish from scattered terms):
    per-row window test over the token array, map-only, no shuffle
    (operators/retrieval.py:phrase_occurrences)."""
    from etl_spark_spark.operators.retrieval import phrase_occurrences

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select("doc_id", tokens("text").alias("__tok"))
    return tok.select(
        "doc_id",
        phrase_occurrences("__tok", ["hash", "join"]).alias("n_occ"),
    ).filter(F.col("n_occ") > 0)


def q_weighted_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted EXACT quartiles: per return flag, the price
    points below which 25/50/75% of the QUANTITY moved — the weighted
    generalization of exact_price_quartiles, same
    distribution-aggregate scale path with integer cumulative weights
    (operators/stats.py:exact_weighted_quantiles)."""
    from etl_spark_spark.operators.stats import exact_weighted_quantiles

    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).withColumn("qty", F.round("l_quantity").cast("long"))
    return exact_weighted_quantiles(
        li, ["l_returnflag"], "l_extendedprice", "qty"
    )


def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness (the engagement ratio product teams track):
    per active day, distinct daily actives, trailing-28-day distinct
    actives, and their exact ratio. The trailing-window distinct is
    computed by FANNING each (user, day) row out to the 28 days it
    supports (map-side sequence+explode) and hash-aggregating distinct
    users per day — no per-day range self-join, no giant window state;
    the fanout factor is the fixed window length, independent of data
    volume."""
    ev = read_events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 27))
        ).alias("day"),
    )
    mau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


def q_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day autocorrelation of daily order revenue — the
    persistence screen for a time series (is a big day followed by a
    big day?). Daily integer-cents totals, consecutive-calendar-day
    pairs via an equi-join on day+1 (distributed; no single-task global
    lag window), then the exact-Pearson shape of corr_exact: decimal
    sufficient statistics and one fixed IEEE tail."""
    orders = table(
        spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    nxt = daily.select(
        F.date_sub(F.col("day"), 1).alias("day"), F.col("cents").alias("y")
    )
    pairs = daily.select("day", F.col("cents").alias("x")).join(nxt, "day")
    # Cast BEFORE multiplying: x,y are daily cents (already ~1.2e10/day
    # at sf1), so long*long would silently overflow int64 at scale.
    # decimal(19,0)*decimal(19,0) -> decimal(38,0), exact like the
    # oracle's HUGEINT path.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("n") * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
    denx = (dec("n") * F.col("sxx") - dec("sx") * dec("sx")).cast("double")
    deny = (dec("n") * F.col("syy") - dec("sy") * dec("sy")).cast("double")
    return s.select(
        "n",
        (num / F.nullif(F.sqrt(denx * deny), F.lit(0.0))).alias("autocorr_1d"),
    )


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


def q_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection (binary-segmentation first split) on the
    daily-revenue series: the split day maximizing the between-segment
    variance reduction G(t) = t(n-t)/n * (mean_left - mean_right)^2 —
    the level-shift detector behind regression alerts. Integer daily
    cents + the distributed prefix sum give exact cumulative sums;
    G is pure rational arithmetic on them (no transcendentals), so the
    doubles are bit-identical in any engine and the argmax is pinned
    with a day tie-break. TakeOrdered top-1, no global sort."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    orders = table(
        spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    cum = scalable_running_sum(
        daily, F.year("day"), ["day"], "cents", out_col="__scum"
    )
    cnt = scalable_running_sum(
        cum.withColumn("__one", F.lit(1).cast("long")),
        F.year("day"),
        ["day"],
        "__one",
        out_col="__t",
    )
    totals = daily.agg(
        F.sum("cents").alias("__s"), F.count("*").alias("__n")
    )
    x = cnt.crossJoin(F.broadcast(totals)).filter(F.col("__t") < F.col("__n"))
    t = F.col("__t").cast("double")
    n = F.col("__n").cast("double")
    ml = F.col("__scum").cast("double") / t
    mr = (F.col("__s") - F.col("__scum")).cast("double") / (n - t)
    g = t * (n - t) / n * (ml - mr) * (ml - mr)
    return (
        x.select(
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("__t").alias("n_left"),
            (F.col("__n") - F.col("__t")).alias("n_right"),
            ml.alias("mean_left_cents"),
            mr.alias("mean_right_cents"),
            g.alias("g_stat"),
        )
        .orderBy(F.desc("g_stat"), "split_day")
        .limit(1)
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): six
    greedy merges learned over the distinct-word frequency table —
    per round one bigram hash aggregate and ONE driver row (the argmax
    pair). The oracle replays the identical recurrence as chained SQL
    stages: same tie-break, same literal-replace merge semantics, so
    the learned merge table matches exactly."""
    from etl_spark_spark.operators.bpe import train_bpe

    docs = table(spark, sf_dir, "documents", columns=["text"])
    merges = train_bpe(docs, "text", n_merges=6)
    rows = [
        (i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, merged string, pair_count long"
    )


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE token budgeting: per document, the token
    count under the 6-merge tokenizer learned from this corpus. Merges
    apply to the DISTINCT-WORD table (each word tokenized once); docs
    join their words and sum — explode + word-keyed join + per-doc
    aggregate (operators/bpe.py:bpe_token_counts)."""
    from etl_spark_spark.operators.bpe import bpe_token_counts

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_token_counts(docs, "doc_id", "text", n_merges=6)


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-CONTAINMENT dedup (|A∩B| / min(|A|,|B|) >= 0.7): catches
    "one doc mostly quoted inside another", which symmetric Jaccard
    misses. Same banded MinHash candidate index as neardup_minhash,
    exact-intersection verified (operators/neardup.py:containment_pairs)."""
    from etl_spark_spark.operators.neardup import containment_pairs

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return containment_pairs(
        toks, "doc_id", word_shingles("t", 3), num_perms=8,
        rows_per_band=2, threshold=0.7,
    )


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order contents: for
    frequently co-ordered part pairs (support >= 3 orders), both
    directed rules with confidence = support/n(antecedent) and lift =
    support*N / (n(antecedent)*n(consequent)) — all exact integer
    ratios. Distinct incidence + one self-join per order + item-count
    broadcasts; the basket total rides a 1-row crossJoin."""
    li = table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    b = li.distinct()
    totals = b.agg(F.countDistinct("l_orderkey").alias("__nb"))
    items = b.groupBy("l_partkey").agg(F.count("*").alias("n"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("pa"), F.col("y.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 3)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "support"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "support",
        )
    )
    na = items.withColumnsRenamed({"l_partkey": "antecedent", "n": "n_ant"})
    nc = items.withColumnsRenamed({"l_partkey": "consequent", "n": "n_con"})
    out = (
        rules.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(totals))
    )
    conf = F.col("support").cast("double") / F.col("n_ant").cast("double")
    lift = (F.col("support") * F.col("__nb")).cast("double") / (
        F.col("n_ant") * F.col("n_con")
    ).cast("double")
    return out.select(
        "antecedent",
        "consequent",
        "support",
        "n_ant",
        "n_con",
        conf.alias("confidence"),
        lift.alias("lift"),
    )


def q_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional term associations: pointwise mutual information
    ln(c_ab·N / (df_a·df_b)) for mid-frequency term pairs co-occurring
    in >= 3 documents — the query-expansion / related-terms primitive.
    df band (5..50) bounds the self-join fanout exactly like the
    co-purchase projections; PMI is micro-scaled (ln ulp rule,
    ORACLE_NOTES.md)."""
    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    dt = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).distinct()
    dfc = dt.groupBy("term").agg(F.count("*").alias("df"))
    totals = dt.agg(F.countDistinct("doc_id").alias("__n"))
    # corpus-relative band (integer comparison, no float threshold):
    # drop near-ubiquitous terms (df > 90% of docs) and hapaxes
    mid = (
        dfc.crossJoin(F.broadcast(totals))
        .filter((F.col("df") >= 2) & (F.col("df") * 10 <= F.col("__n") * 9))
        .select("term", "df")
    )
    dtm = dt.join(F.broadcast(mid), "term")
    a, b = dtm.alias("a"), dtm.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"),
            F.col("b.term").alias("term_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    pmi = F.log(
        (F.col("c_ab") * F.col("__n")).cast("double")
        / (F.col("df_a") * F.col("df_b")).cast("double")
    )
    return (
        pairs.crossJoin(F.broadcast(totals))
        .select(
            "term_a",
            "term_b",
            "c_ab",
            "df_a",
            "df_b",
            F.round(pmi * 1e6).cast("long").alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), "term_a", "term_b")
        .limit(50)
    )


# the (threshold, recall) contract the tuned eval pins — banding is
# DERIVED from these via the S-curve (plan_banding), not hand-picked
_EVAL_THRESHOLDS = (0.5, 0.7, 0.8)
_EVAL_TARGET_RECALL = 0.9
_EVAL_MAX_PERMS = 64


def q_neardup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-quality evaluation as a query (round-7 tuned form):
    recall/precision of the banded MinHash-LSH detector against the
    EXACT Jaccard ground truth, at thresholds {0.5, 0.7, 0.8}, with
    banding AUTO-DERIVED per threshold from the (threshold,
    target_recall=0.9) contract via the S-curve 1-(1-t^r)^b
    (operators.neardup.plan_banding) — replacing the round-6 fixed
    toy settings (8 perms / 2 rows, P(0.5)=0.68). One row per
    threshold; the report a dedup pipeline publishes before anyone
    trusts its banding. The exact side is computed ONCE at the lowest
    threshold and filtered per row (prefix-filtered exact join —
    proven equal to brute force; inherits the O(n^2) eval-only guard,
    see q_neardup_recall_sampled for the scale path).

    Round-8 cost fix (output bit-identical): per-threshold detector
    verification used to re-run the pair_overlap_counts exact-Jaccard
    join THREE times over the banded candidates — but the checkpointed
    exact side already knows every pair's Jaccard at >= the lowest
    threshold, and every eval threshold is >= it. Detector output is
    therefore candidates ⋈ rep-level-exact (three cheap hash joins
    against a small checkpointed table), with the same __i/(na+nb-i)
    value carried through — the verify joins vanish from the plan."""
    from etl_spark_spark.operators.neardup import (
        collapse_identical_sets,
        expand_collapsed_pairs,
        lsh_candidate_pairs,
        minhash_signature,
        plan_banding,
        prefix_filtered_jaccard_pairs,
        shingle_set,
    )

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    exact = prefix_filtered_jaccard_pairs(
        toks, "doc_id", word_shingles("t", 3), threshold=min(_EVAL_THRESHOLDS)
    ).select("id_a", "id_b", "jaccard").localCheckpoint()
    # shared inputs, materialized once: the collapsed shingle table,
    # the expansion table, and ONE signature at the max perm count —
    # each threshold bands a PREFIX of the same mh columns (identical
    # values to computing its own signature; the md5 pass — the
    # dominant cost — is paid once, not per threshold)
    plans = {
        t: plan_banding(t, _EVAL_TARGET_RECALL, _EVAL_MAX_PERMS)
        for t in _EVAL_THRESHOLDS
    }
    sh = shingle_set(toks, "doc_id", word_shingles("t", 3))
    reps_sh, members = collapse_identical_sets(sh, "doc_id")
    members = members.localCheckpoint()
    sig = minhash_signature(
        reps_sh, "doc_id", max(np_ for np_, _ in plans.values())
    ).localCheckpoint()
    # rep-level exact pairs: the doc-level exact table restricted to
    # family representatives (reps are members of their own families,
    # so rep-rep pairs appear verbatim in the expanded exact output)
    rep_ids = members.filter(F.col("__doc") == F.col("__r")).select(
        F.col("__r").alias("__rid")
    )
    rep_exact = (
        exact.join(
            rep_ids.withColumnRenamed("__rid", "id_a"), "id_a"
        )
        .join(rep_ids.withColumnRenamed("__rid", "id_b"), "id_b")
        .localCheckpoint()
    )
    out = None
    for t in _EVAL_THRESHOLDS:
        num_perms, rows_per_band = plans[t]
        ex_t = exact.filter(F.col("jaccard") >= t).select("id_a", "id_b")
        cand_t = lsh_candidate_pairs(
            sig, "doc_id", num_perms, rows_per_band
        )
        rep_pairs = cand_t.join(
            rep_exact.filter(F.col("jaccard") >= t), ["id_a", "id_b"]
        )
        lsh_t = (
            expand_collapsed_pairs(rep_pairs, members, {"jaccard": F.lit(1.0)})
            .filter(F.col("jaccard") >= t)
            .select("id_a", "id_b")
        )
        tp = ex_t.join(lsh_t, ["id_a", "id_b"])
        row = (
            ex_t.agg(F.count("*").alias("n_exact"))
            .crossJoin(lsh_t.agg(F.count("*").alias("n_lsh")))
            .crossJoin(tp.agg(F.count("*").alias("n_tp")))
            .select(
                F.lit(int(round(t * 100))).cast("long").alias(
                    "threshold_pct"
                ),
                F.lit(num_perms).cast("long").alias("num_perms"),
                F.lit(rows_per_band).cast("long").alias("rows_per_band"),
                "n_exact",
                "n_lsh",
                "n_tp",
                (
                    F.col("n_tp").cast("double")
                    / F.col("n_exact").cast("double")
                ).alias("recall"),
                (
                    F.col("n_tp").cast("double")
                    / F.col("n_lsh").cast("double")
                ).alias("precision"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def q_neardup_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall measurement that SCALES (round-7 judge task 5): the
    ground-truth side is a deterministic 1/4 hash-sample of the exact
    rep-level true pairs (operators.neardup.sampled_ground_truth_pairs
    — pair generation streams through the sample filter, nothing
    quadratic is materialized), so the recall report itself can
    accompany the registry to corpus sizes where the exact eval's
    O(n^2) guard raises. Detector side: auto-tuned banding at the
    (0.5, 0.9) contract. One row: banding, sample modulus, sampled
    true-pair count, detected count, recall estimate."""
    from etl_spark_spark.operators.neardup import sampled_recall_report

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    return sampled_recall_report(
        toks,
        "doc_id",
        word_shingles("t", 3),
        threshold=0.5,
        target_recall=_EVAL_TARGET_RECALL,
        pair_mod=4,
        max_perms=_EVAL_MAX_PERMS,
    )


def q_stock_balance_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance clamped at zero (the warehouse-stock / cash-
    register recurrence b_t = max(0, b_{t-1} + x_t)) — NOT a plain
    prefix sum, and naively sequential. Distributed exactly via the
    identity b_t = S_t - min(0, min_{k<=t} S_k): one prefix SUM and one
    prefix MIN per supplier partition, both integer, both associative.
    Daily net = returned quantity in minus shipped quantity out."""
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_quantity", "l_returnflag"],
    ).filter(F.col("l_suppkey") <= 20)
    sign = F.when(F.col("l_returnflag") == "R", 1).otherwise(-1)
    daily = li.groupBy(
        "l_suppkey", F.to_date("l_shipdate").alias("day")
    ).agg(F.sum(F.round("l_quantity").cast("long") * sign).alias("net"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.withColumn("s", F.sum("net").over(w))
    cum = cum.withColumn("m", F.min("s").over(w))
    balance = F.col("s") - F.least(F.lit(0).cast("long"), F.col("m"))
    return cum.select(
        "l_suppkey",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "net",
        balance.alias("balance"),
    )


def q_purchase_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for days-to-first-purchase with
    right censoring (users who never purchase are censored at their
    last observed event) — the churn/conversion survival analysis a
    plain conversion rate can't give. Per-user observation built from
    three min/max aggregates; the curve itself is a distribution
    aggregate over distinct day values + the distributed prefix sum
    (at-risk counts) + a log-space cumulative product, micro-scaled
    because exp/ln are 1-ulp engine-divergent (ORACLE_NOTES.md)."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    obs = per_user.select(
        F.when(
            F.col("first_purchase").isNotNull(),
            F.datediff(F.to_date("first_purchase"), F.to_date("first_ts")),
        )
        .otherwise(F.datediff(F.to_date("last_ts"), F.to_date("first_ts")))
        .alias("t"),
        F.col("first_purchase").isNotNull().cast("long").alias("event"),
    )
    dist = obs.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(1 - F.col("event")).alias("c"),
    )
    cum = scalable_running_sum(
        dist.withColumn("__rm", F.col("d") + F.col("c")),
        F.col("t"),
        ["t"],
        "__rm",
        out_col="__cumrm",
    )
    totals = dist.agg(F.sum(F.col("d") + F.col("c")).alias("__n"))
    cum = cum.crossJoin(F.broadcast(totals)).withColumn(
        "n_risk", F.col("__n") - (F.col("__cumrm") - F.col("__rm"))
    )
    # d == n_risk drives survival to EXACTLY zero (ln(0) is undefined):
    # carry it as an absorbing flag via a prefix sum of indicators
    lnf = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    zero = (F.col("d") == F.col("n_risk")).cast("long")
    cum = scalable_running_sum(
        cum.withColumn("__lnf", lnf).withColumn("__z", zero),
        F.col("t"), ["t"], "__lnf", out_col="__cumln",
    )
    cum = scalable_running_sum(
        cum, F.col("t"), ["t"], "__z", out_col="__cumz"
    )
    surv = F.when(
        F.col("__cumz") > 0, F.lit(0).cast("long")
    ).otherwise(F.round(F.exp("__cumln") * 1e6).cast("long"))
    return cum.filter(F.col("d") > 0).select(
        "t", "n_risk", "d", "c", surv.alias("survival_micro")
    )


def q_ab_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing the A/B time-to-first-purchase survival
    curves (the hypothesis test that pairs with purchase_survival_km;
    same deterministic md5 variant split as the other A/B shapes). Per
    distinct day: integer death/at-risk counts via two distributed
    prefix sums; the statistic folds hypergeometric expectations and
    variances — micro-scaled because the final sums are short
    order-dependent float folds."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fp"),
    )
    obs = per_user.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_a"),
        F.when(
            F.col("fp").isNotNull(),
            F.datediff(F.to_date("fp"), F.to_date("first_ts")),
        )
        .otherwise(F.datediff(F.to_date("last_ts"), F.to_date("first_ts")))
        .alias("t"),
        F.col("fp").isNotNull().cast("long").alias("event"),
    )
    dist = obs.groupBy("t").agg(
        F.sum(F.col("event") * F.col("is_a")).alias("d_a"),
        F.sum("event").alias("d"),
        F.sum("is_a").alias("rm_a"),
        F.count("*").alias("rm"),
    )
    cum = scalable_running_sum(dist, F.col("t"), ["t"], "rm_a", out_col="__ca")
    cum = scalable_running_sum(cum, F.col("t"), ["t"], "rm", out_col="__c")
    totals = dist.agg(
        F.sum("rm_a").alias("__na"), F.sum("rm").alias("__n")
    )
    k = cum.crossJoin(F.broadcast(totals)).select(
        "t",
        "d_a",
        "d",
        (F.col("__na") - (F.col("__ca") - F.col("rm_a"))).alias("n_a"),
        (F.col("__n") - (F.col("__c") - F.col("rm"))).alias("n"),
    ).filter((F.col("d") > 0) & (F.col("n") > 1))
    p = F.col("n_a").cast("double") / F.col("n").cast("double")
    e_a = F.col("d").cast("double") * p
    v = (
        F.col("d").cast("double")
        * p
        * (1.0 - p)
        * (F.col("n") - F.col("d")).cast("double")
        / (F.col("n") - 1).cast("double")
    )
    agg = k.agg(
        F.sum("d_a").alias("o_a"),
        F.sum(e_a).alias("__e"),
        F.sum(v).alias("__v"),
    )
    z = (F.col("o_a").cast("double") - F.col("__e")) / F.sqrt("__v")
    return agg.select(
        "o_a",
        F.round(F.col("__e") * 1e6).cast("long").alias("e_a_micro"),
        F.round(F.col("__v") * 1e6).cast("long").alias("v_micro"),
        F.round(z * 1e6).cast("long").alias("z_micro"),
    )


def q_revenue_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% CI for the mean order value, single-pass Poisson
    style (per-(row, replicate) Poisson(1) weights from md5-uniforms
    against embedded integer CDF thresholds — no resampling shuffle,
    deterministic across engines). 100 replicates; CI = 3rd/98th
    order-statistic replicate means
    (operators/stats.py:poisson_bootstrap_mean_ci)."""
    from etl_spark_spark.operators.stats import poisson_bootstrap_mean_ci

    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return poisson_bootstrap_mean_ci(orders, "o_orderkey", "cents", b=100)


def q_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 10% two-sided trimmed mean of order values — the robust
    location estimate outliers can't drag. No sort of the data: the
    k lowest/highest observations are removed ARITHMETICALLY from the
    per-distinct-value distribution (clamped tie-aware effective
    counts over the distributed prefix sum), so every intermediate is
    an exact integer and the final mean one exact division."""
    from etl_spark_spark.operators.windows import scalable_running_sum

    orders = table(spark, sf_dir, "orders", columns=["o_totalprice"])
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    dist = vals.groupBy("v").agg(F.count("*").alias("c"))
    cum = scalable_running_sum(dist, F.col("v"), ["v"], "c", out_col="cumc")
    totals = dist.agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.col("v")).alias("s")
    )
    x = cum.crossJoin(F.broadcast(totals))
    k = F.floor(F.col("n") / 10).cast("long")
    cum_before = F.col("cumc") - F.col("c")
    low_eff = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("c"), k - cum_before),
    )
    above = F.col("n") - F.col("cumc")
    high_eff = F.greatest(
        F.lit(0).cast("long"), F.least(F.col("c"), k - above)
    )
    agg = x.groupBy("n", "s").agg(
        F.sum(low_eff * F.col("v")).alias("__slow"),
        F.sum(high_eff * F.col("v")).alias("__shigh"),
    )
    kk = F.floor(F.col("n") / 10).cast("long")
    tmean = (
        (F.col("s") - F.col("__slow") - F.col("__shigh")).cast("double")
        / (F.col("n") - 2 * kk).cast("double")
    )
    return agg.select(
        "n",
        kk.alias("k_trimmed_each_side"),
        (F.col("s").cast("double") / F.col("n").cast("double")).alias(
            "mean_cents"
        ),
        tmean.alias("trimmed_mean_cents"),
    )


def q_doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document filter (Rae et al. 2021, arXiv:2112.11446
    §A1.1, public method): the published corpus quality heuristics as
    per-rule boolean flags plus the composite keep decision. Every
    ratio threshold is cross-multiplied into an integer inequality, so
    flags are bit-reproducible across engines (extension: corpus
    quality filtering; complements the continuous quality_score)."""
    from functools import reduce

    from etl_spark_spark.functions.text import (
        gopher_rule_counters,
        gopher_rule_flags,
    )

    docs = table(spark, sf_dir, "documents")
    counters = gopher_rule_counters("text")
    n_stop = stopword_hits("text", LANG_PROFILES["en"]).cast("long")
    flags = gopher_rule_flags(counters, n_stop)
    keep = reduce(lambda a, b: a & b, flags.values())
    return docs.select(
        "doc_id",
        "source",
        *[v.alias(k) for k, v in counters.items()],
        n_stop.alias("n_stop"),
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )


def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (TANE-family schema discovery,
    public method) across four tables: does lhs determine rhs? One
    hash aggregate per candidate, no joins (extension: data-quality /
    schema profiling; operators/quality.py)."""
    fd = functional_dependencies
    return (
        fd(table(spark, sf_dir, "part"),
           [("p_brand", "p_type"), ("p_name", "p_brand")], "part")
        .union(fd(table(spark, sf_dir, "orders"),
                  [("o_custkey", "o_orderpriority")], "orders"))
        .union(fd(table(spark, sf_dir, "customer"),
                  [("c_name", "c_nationkey")], "customer"))
        .union(fd(table(spark, sf_dir, "nation"),
                  [("n_nationkey", "n_regionkey"),
                   ("n_regionkey", "n_nationkey")], "nation"))
    )


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-length histogram per source — the corpus
    length-distribution profile every mixing decision starts from.
    Buckets come from the binary-representation length (exact integer
    path in both engines; floor(log2(x)) through doubles could flip at
    boundaries)."""
    docs = table(spark, sf_dir, "documents")
    n = token_count("text").cast("long")
    base = docs.select("source", n.alias("__n"))
    bucket = (F.length(F.conv(F.col("__n").cast("string"), 10, 2)) - 1).cast(
        "int"
    )
    return (
        base.groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("__n").alias("min_tokens"),
            F.max("__n").alias("max_tokens"),
            F.sum("__n").cast("long").alias("sum_tokens"),
        )
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 3-gram contamination matrix: distinct shared
    shingles per source pair, with per-source vocabulary sizes
    (extension: corpus curation — the 'how much does crawl A duplicate
    corpus B' audit run before setting mixing weights). Shingle-keyed
    join, per-group fanout bounded by the source count
    (operators/corpus_stats.py:source_shingle_overlap)."""
    from etl_spark_spark.operators.corpus_stats import source_shingle_overlap

    docs = table(spark, sf_dir, "documents")
    t = docs.select("source", tokens("text").alias("t"))
    return source_shingle_overlap(t, "source", word_shingles("t", 3))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "superdesconto": q_superdesconto,
        "allocation": q_allocation,
        "pricing_summary": q_pricing_summary,
        "dedup_latest_part": q_dedup_latest_part,
        "top_orders_per_customer": q_top_orders_per_customer,
        "customers_without_orders": q_customers_without_orders,
        "orders_enriched": q_orders_enriched,
        "normalize_keys": q_normalize_keys,
        "monthly_orders_1995": q_monthly_orders_1995,
        "events_by_type": q_events_by_type,
        "doc_text_stats": q_doc_text_stats,
        "doc_lang_id": q_doc_lang_id,
        "doc_exact_dedup": q_doc_exact_dedup,
        "neardup_minhash": q_neardup_minhash,
        "neardup_bucket_cap": q_neardup_bucket_cap,
        "neardup_ngram_jaccard": q_neardup_ngram_jaccard,
        "neardup_prefix_jaccard": q_neardup_prefix_jaccard,
        "doc_simhash": q_doc_simhash,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_cosine_topk_lsh": q_emb_cosine_topk_lsh,
        "emb_cosine_topk_ivf": q_emb_cosine_topk_ivf,
        "emb_cosine_topk_ivfpq": q_emb_cosine_topk_ivfpq,
        "events_tumbling": q_events_tumbling,
        "events_time_rollup": q_events_time_rollup,
        "events_sessionize": q_events_sessionize,
        "multimodal_features": q_multimodal_features,
        "custkeys_both_years": q_custkeys_both_years,
        "custkeys_only_1995": q_custkeys_only_1995,
        "rollup_losses": q_rollup_losses,
        "supplier_share_expr": q_supplier_share_expr,
        "events_props_map": q_events_props_map,
        "events_sliding": q_events_sliding,
        "emb_near_dup": q_emb_near_dup,
        "semantic_dedup": q_semantic_dedup,
        "emb_near_dup_lsh": q_emb_near_dup_lsh,
        "global_top_orders": q_global_top_orders,
        "doc_fingerprints": q_doc_fingerprints,
        "shipping_priority": q_shipping_priority,
        "local_supplier_volume": q_local_supplier_volume,
        "dedup_any_count": q_dedup_any_count,
        "nation_reconcile": q_nation_reconcile,
        "sql_frontend": q_sql_frontend,
        "user_value_trend": q_user_value_trend,
        "orders_profile": q_orders_profile,
        "above_avg_orders": q_above_avg_orders,
        "emb_stats": q_emb_stats,
        "price_quantiles": q_price_quantiles,
        "purchase_last_click": q_purchase_last_click,
        "neardup_simhash": q_neardup_simhash,
        "neardup_simhash_exact": q_neardup_simhash_exact,
        "sketch_stats": q_sketch_stats,
        "error_context_views": q_error_context_views,
        "multimodal_frames": q_multimodal_frames,
        "doc_split_counts": q_doc_split_counts,
        "doc_stratified_sample": q_doc_stratified_sample,
        "doc_group_split": q_doc_group_split,
        "doc_repetition": q_doc_repetition,
        "doc_pii_scrub": q_doc_pii_scrub,
        "data_quality": q_data_quality,
        "source_mix_sample": q_source_mix_sample,
        "doc_shuffle_order": q_doc_shuffle_order,
        "fuzzy_code_match": q_fuzzy_code_match,
        "returns_grouping_sets": q_returns_grouping_sets,
        "market_share": q_market_share,
        "doc_source_cap": q_doc_source_cap,
        "vocab_topk": q_vocab_topk,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_pack": q_doc_pack,
        "doc_top_terms": q_doc_top_terms,
        "customer_spend_deciles": q_customer_spend_deciles,
        "neardup_clusters": q_neardup_clusters,
        "small_qty_revenue": q_small_qty_revenue,
        "emb_label_centroids": q_emb_label_centroids,
        "price_histogram": q_price_histogram,
        "event_funnel": q_event_funnel,
        "user_retention_cohorts": q_user_retention_cohorts,
        "doc_quality_model": q_doc_quality_model,
        "doc_incremental_dedup": q_doc_incremental_dedup,
        "doc_chunks": q_doc_chunks,
        "doc_weighted_sample": q_doc_weighted_sample,
        "doc_curation": q_doc_curation,
        "doc_curation_capped": q_doc_curation_capped,
        "doc_training_prep": q_doc_training_prep,
        "customer_order_gaps": q_customer_order_gaps,
        "customer_year_arrays": q_customer_year_arrays,
        "order_priority_counts": q_order_priority_counts,
        "min_cost_supplier": q_min_cost_supplier,
        "volume_shipping": q_volume_shipping,
        "product_profit": q_product_profit,
        "returned_top_customers": q_returned_top_customers,
        "important_parts": q_important_parts,
        "custdist": q_custdist,
        "promo_revenue": q_promo_revenue,
        "top_supplier": q_top_supplier,
        "large_orders": q_large_orders,
        "part_promotion_suppliers": q_part_promotion_suppliers,
        "orders_pit_dimension": q_orders_pit_dimension,
        "doc_length_winsor": q_doc_length_winsor,
        "merge_upsert": q_merge_upsert,
        "cast_decimal_policy": q_cast_decimal_policy,
        "production_daily_loop": q_production_daily_loop,
        "doc_dsir_weights": q_doc_dsir_weights,
        "emb_covariance": q_emb_covariance,
        "emb_covariance_blocked": q_emb_covariance_blocked,
        "doc_epoch_shuffle": q_doc_epoch_shuffle,
        "doc_training_mix": q_doc_training_mix,
        "text_formats_roundtrip": q_text_formats_roundtrip,
        "incremental_join_mv": q_incremental_join_mv,
        "join_mv_temporal": q_join_mv_temporal,
        "compacted_snapshot": q_compacted_snapshot,
        "join_mv_retractions": q_join_mv_retractions,
        "ks_drift_by_type": q_ks_drift_by_type,
        "indexed_zorder_scan": q_indexed_zorder_scan,
        "emb_hard_negatives": q_emb_hard_negatives,
        "emb_label_outliers": q_emb_label_outliers,
        "doc_bigram_surprisal": q_doc_bigram_surprisal,
        "cluster_canonicalize": q_cluster_canonicalize,
        "events_forward_fill": q_events_forward_fill,
        "split_leakage": q_split_leakage,
        "trade_pagerank": q_trade_pagerank,
        "supplier_co_purchase": q_supplier_co_purchase,
        "supplier_triangles": q_supplier_triangles,
        "event_transitions": q_event_transitions,
        "user_activity_streaks": q_user_activity_streaks,
        "ab_test_welch": q_ab_test_welch,
        "lang_id_eval": q_lang_id_eval,
        "multi_touch_attribution": q_multi_touch_attribution,
        "pareto_parts": q_pareto_parts,
        "inverted_index": q_inverted_index,
        "benford_totalprice": q_benford_totalprice,
        "exact_price_quartiles": q_exact_price_quartiles,
        "ks_test_ab": q_ks_test_ab,
        "events_props_variant": q_events_props_variant,
        "pyds_source_stats": q_pyds_source_stats,
        "time_weighted_value": q_time_weighted_value,
        "monthly_revenue_mom": q_monthly_revenue_mom,
        "abc_classification": q_abc_classification,
        "conversion_latency": q_conversion_latency,
        "part_cooccurrence_cosine": q_part_cooccurrence_cosine,
        "chi2_type_variant": q_chi2_type_variant,
        "customer_spend_gini": q_customer_spend_gini,
        "concurrent_sessions": q_concurrent_sessions,
        "global_spend_rank": q_global_spend_rank,
        "replica_drift_audit": q_replica_drift_audit,
        "customer_order_docs": q_customer_order_docs,
        "doc_budget_mix": q_doc_budget_mix,
        "forecast_revenue": q_forecast_revenue,
        "revenue_cube": q_revenue_cube,
        "priority_return_pivot": q_priority_return_pivot,
        "corr_exact": q_corr_exact,
        "disjunctive_revenue": q_disjunctive_revenue,
        "exclusive_supplier_orders": q_exclusive_supplier_orders,
        "part_supplier_counts": q_part_supplier_counts,
        "rich_idle_customers": q_rich_idle_customers,
        "user_rolling_value": q_user_rolling_value,
        "session_paths": q_session_paths,
        "returns_unpivot": q_returns_unpivot,
        "sketch_rollup": q_sketch_rollup,
        "doc_bigram_novelty": q_doc_bigram_novelty,
        "scd2_customer_history": q_scd2_customer_history,
        "doc_group_sample": q_doc_group_sample,
        "daily_dense_orders": q_daily_dense_orders,
        "price_outliers": q_price_outliers,
        "bm25_search": q_bm25_search,
        "doc_surprisal": q_doc_surprisal,
        "duplicate_spans": q_duplicate_spans,
        "mann_whitney_ab": q_mann_whitney_ab,
        "supplier_reach_bfs": q_supplier_reach_bfs,
        "column_entropy": q_column_entropy,
        "priority_lines_by_status": q_priority_lines_by_status,
        "waiting_suppliers": q_waiting_suppliers,
        "mv_routed_revenue": q_mv_routed_revenue,
        "cumulative_new_customers": q_cumulative_new_customers,
        "order_value_position": q_order_value_position,
        "media_phash_pairs": q_media_phash_pairs,
        "phrase_search": q_phrase_search,
        "weighted_price_quartiles": q_weighted_price_quartiles,
        "dau_mau_stickiness": q_dau_mau_stickiness,
        "revenue_autocorr": q_revenue_autocorr,
        "knn_label_accuracy": q_knn_label_accuracy,
        "revenue_changepoint": q_revenue_changepoint,
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
        "doc_containment": q_doc_containment,
        "basket_rules": q_basket_rules,
        "term_pmi": q_term_pmi,
        "neardup_eval": q_neardup_eval,
        "neardup_recall_sampled": q_neardup_recall_sampled,
        "stock_balance_floor": q_stock_balance_floor,
        "purchase_survival_km": q_purchase_survival_km,
        "ab_logrank_test": q_ab_logrank_test,
        "revenue_bootstrap_ci": q_revenue_bootstrap_ci,
        "trimmed_mean_price": q_trimmed_mean_price,
        "doc_gopher_filter": q_doc_gopher_filter,
        "fd_audit": q_fd_audit,
        "doc_length_histogram": q_doc_length_histogram,
        "source_overlap": q_source_overlap,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB ANSI SQL)
# --------------------------------------------------------------------------

_FEED_SQL = """
    SELECT l_suppkey AS filial,
           l_partkey AS cod_prod,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS periodo,
           lpad(trim(CAST(l_partkey AS VARCHAR)), 30, '0') AS etiqueta,
           l_discount AS perc_dsc_cupom,
           l_extendedprice AS venda,
           l_extendedprice * (1 - l_discount) AS venda_desconto,
           l_orderkey AS src_ordem,
           l_linenumber AS src_linha
    FROM lineitem WHERE l_linestatus = '{st}'
"""

_SUPERDESCONTO_SQL = f"""
WITH cupom AS ({_FEED_SQL.format(st="O")} UNION ALL {_FEED_SQL.format(st="F")}),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY etiqueta
        ORDER BY venda_desconto DESC, src_ordem, src_linha
    ) AS rn
    FROM cupom
)
SELECT r.etiqueta, r.filial, r.cod_prod, r.periodo, r.venda,
       r.venda_desconto, r.perc_dsc_cupom,
       p.p_name AS produto_nome, p.p_brand AS produto_marca,
       p.p_retailprice AS preco_tabela, s.s_name AS fornecedor_nome
FROM ranked r
JOIN part p ON r.cod_prod = p.p_partkey
JOIN supplier s ON r.filial = s.s_suppkey
WHERE r.rn = 1
"""

_ALLOCATION_SQL = """
WITH losses AS (
    SELECT s_nationkey AS nation_key, l_suppkey AS supp_key,
           sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS perdas_cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1, 2
),
losses_w AS (
    SELECT *, sum(perdas_cents) OVER (PARTITION BY nation_key) AS grupo_perda_cents
    FROM losses
),
credits AS (
    SELECT nation_key, sum(credito_cents) AS credito_cents FROM (
        SELECT c_nationkey AS nation_key,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS credito_cents
        FROM customer WHERE c_acctbal > 0 GROUP BY 1
        UNION ALL
        SELECT s_nationkey AS nation_key,
               sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS credito_cents
        FROM supplier WHERE s_acctbal > 0 GROUP BY 1
    ) u GROUP BY 1
),
combined AS (
    SELECT l.nation_key, l.supp_key, l.perdas_cents, l.grupo_perda_cents,
           c.credito_cents
    FROM losses_w l JOIN credits c ON l.nation_key = c.nation_key
    UNION ALL
    SELECT l.nation_key, l.supp_key, l.perdas_cents, l.grupo_perda_cents,
           NULL AS credito_cents
    FROM losses_w l
    WHERE NOT EXISTS (SELECT 1 FROM credits c WHERE c.nation_key = l.nation_key)
    UNION ALL
    SELECT c.nation_key, NULL AS supp_key, NULL AS perdas_cents,
           NULL AS grupo_perda_cents, c.credito_cents
    FROM credits c
    WHERE NOT EXISTS (SELECT 1 FROM losses_w l WHERE l.nation_key = c.nation_key)
)
SELECT nation_key, supp_key,
       coalesce(perdas_cents / 100.0, 0.0) AS perdas,
       coalesce(grupo_perda_cents / 100.0, 0.0) AS grupo_perda,
       coalesce(credito_cents / 100.0, 0.0) AS credito,
       coalesce(perdas_cents / nullif(grupo_perda_cents, 0) * (credito_cents / 100.0),
                credito_cents / 100.0, 0.0) AS rateio
FROM combined
"""

_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql("l_quantity")} AS sum_qty,
       {money_sum_sql("l_extendedprice")} AS sum_base_price,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {money_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {money_sum_sql("l_quantity")} / count(*) AS avg_qty,
       {money_sum_sql("l_extendedprice")} / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_DEDUP_LATEST_SQL = """
SELECT l_partkey,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS last_ship_date,
       l_orderkey AS last_orderkey,
       l_extendedprice AS last_price
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY l_partkey
        ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
    ) AS rn
    FROM lineitem
) t WHERE rn = 1
"""

_TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
    SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS rank_in_cust
    FROM orders
) t WHERE rank_in_cust <= 3
"""

_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
)
"""

_ORDERS_ENRICHED_SQL = """
SELECT o_orderkey, o_custkey,
       coalesce(c_name, 'UNKNOWN') AS cust_name,
       coalesce(c_mktsegment, 'NONE') AS segment,
       o_totalprice
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus IN ('O', 'F') AND o_orderpriority IS NOT NULL
"""

_NORMALIZE_KEYS_SQL = f"""
SELECT p_partkey,
       lpad(trim(CAST(p_partkey AS VARCHAR)), 30, '0') AS etiqueta,
       upper(regexp_replace(
           translate(trim(p_name), '{_ACCENTS_SRC}', '{_ACCENTS_DST}'),
           ' +', ' ', 'g')) AS nome_norm,
       lpad(regexp_replace(trim(CAST(p_type AS VARCHAR)),
                           '[^0-9a-zA-Z]', '', 'g'), 15, '0') AS tipo_norm,
       upper(trim(p_brand)) AS marca_norm
FROM part
"""

_MONTHLY_ORDERS_SQL = f"""
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS mes,
       {money_sum_sql("o_totalprice")} AS total_mes,
       count(*) AS num_pedidos
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1
"""

_EVENTS_BY_TYPE_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       -- BIGINT cast: DuckDB sum(int) yields HUGEINT -> float64 in
       -- pandas, which would hash as 3.0 vs Spark's 3
       CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       {money_sum_sql("value")} AS sum_value
FROM events
WHERE event_type IN ('click', 'view', 'purchase') AND props IS NOT NULL
GROUP BY event_type
"""


# -- extension oracles (documents / embeddings / events) --------------------

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_EN_PAT = r"\b(the|a|and|of|to)\b"

_DOC_TEXT_STATS_SQL = rf"""
WITH base AS (
    SELECT doc_id, lang, text,
           len({_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
               AS n_bpe_tokens,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           len(regexp_extract_all(lower(trim(text)), '{_EN_PAT}')) AS n_stop_en
    FROM documents
)
SELECT doc_id, lang, n_tokens, n_bpe_tokens, n_punct, n_stop_en,
       round(
           least(1.0, (CAST(n_stop_en AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0)
           * (1.0 - least(1.0, (CAST(n_punct AS DOUBLE) / CAST(length(text) AS DOUBLE)) * 10.0)),
       6) AS quality
FROM base
"""

_LANGS = ["en", "es", "fr", "de", "zh"]
_LANG_PATS = {
    "en": r"\b(the|a|and|of|to)\b",
    "es": r"\b(el|la|de|que|y)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "de": r"\b(der|die|und|das|ist)\b",
}


def _lang_case_sql() -> str:
    whens = []
    for lang in _LANGS[:-1]:
        conds = " AND ".join(
            f"score_{lang} >= score_{o}" for o in _LANGS if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(whens) + f" ELSE '{_LANGS[-1]}' END"


_DOC_LANG_ID_SQL = (
    "WITH scored AS (SELECT doc_id, lang, "
    + ", ".join(
        rf"len(regexp_extract_all(lower(trim(text)), '{_LANG_PATS[lang]}')) AS score_{lang}"
        for lang in _LANGS[:-1]
    )
    + r", len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS score_zh"
    + " FROM documents) SELECT doc_id, lang, "
    + ", ".join(f"score_{lang}" for lang in _LANGS)
    + f", {_lang_case_sql()} AS pred_lang FROM scored"
)

_LANG_ID_EVAL_SQL = f"""
WITH lang_scored AS ({_DOC_LANG_ID_SQL}),
a AS (
  SELECT lang AS lang_c, CAST(count(*) AS BIGINT) AS support,
         CAST(count(*) FILTER (pred_lang = lang) AS BIGINT) AS tp
  FROM lang_scored GROUP BY 1
),
p AS (
  SELECT pred_lang AS lang_c, CAST(count(*) AS BIGINT) AS pred_n
  FROM lang_scored GROUP BY 1
),
j AS (
  SELECT coalesce(a.lang_c, p.lang_c) AS lang,
         coalesce(support, 0) AS support,
         coalesce(tp, 0) AS tp,
         coalesce(pred_n, 0) AS pred_n
  FROM a FULL OUTER JOIN p ON a.lang_c = p.lang_c
),
m AS (
  SELECT lang, support, tp, pred_n,
         CASE WHEN pred_n > 0
              THEN CAST(tp AS DOUBLE) / CAST(pred_n AS DOUBLE) END AS prec,
         CASE WHEN support > 0
              THEN CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END AS rec
  FROM j
)
SELECT lang, support, tp, pred_n, prec, rec,
       CASE WHEN prec + rec > 0
            THEN 2.0 * prec * rec / (prec + rec) END AS f1
FROM m
"""

_DOC_EXACT_DEDUP_SQL = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""

_SHINGLES = rf"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh0 AS (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE []::VARCHAR[] END) AS s
    FROM toks
),
sh AS (SELECT DISTINCT doc_id, s FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""

_MH_COLS = ", ".join(
    f"min(md5('{p}~' || s)) AS mh{p}" for p in range(8)
)
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, mh{2*b} || '#' || mh{2*b+1} AS key FROM sig"
    for b in range(4)
)

_NEARDUP_MINHASH_SQL = f"""
WITH {_SHINGLES},
sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BANDS_SQL}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter / (sa.n + sb.n - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
"""

_NEARDUP_BUCKET_CAP_SQL = f"""
WITH {_SHINGLES},
docsets AS (
    SELECT doc_id, list_sort(list(s)) AS ss FROM sh GROUP BY doc_id
),
fam AS (
    SELECT ss, min(doc_id) AS rep, list(doc_id) AS members_, len(ss) AS n
    FROM docsets GROUP BY ss
),
mem AS (SELECT rep, unnest(members_) AS doc FROM fam),
repsh AS (SELECT rep AS doc_id, unnest(ss) AS s FROM fam),
sig AS (SELECT doc_id, {_MH_COLS} FROM repsh GROUP BY doc_id),
bands AS ({_BANDS_SQL}),
sized AS (
    SELECT doc_id, band, key,
           count(*) OVER (PARTITION BY band, key) AS bsz,
           min(doc_id) OVER (PARTITION BY band, key) AS hub
    FROM bands
),
cand AS (
    SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        WHERE a.bsz <= 2 AND b.bsz <= 2
        UNION ALL
        SELECT hub AS id_a, doc_id AS id_b FROM sized
        WHERE bsz > 2 AND doc_id != hub
    )
),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand c
    JOIN repsh x ON x.doc_id = c.id_a
    JOIN repsh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
),
rsizes AS (SELECT rep, n FROM fam),
verified AS (
    SELECT i.id_a, i.id_b, i.inter / (sa.n + sb.n - i.inter) AS jaccard
    FROM inter i
    JOIN rsizes sa ON sa.rep = i.id_a
    JOIN rsizes sb ON sb.rep = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
),
cross_expanded AS (
    SELECT least(ma.doc, mb.doc) AS id_a,
           greatest(ma.doc, mb.doc) AS id_b, v.jaccard
    FROM verified v
    JOIN mem ma ON ma.rep = v.id_a
    JOIN mem mb ON mb.rep = v.id_b
),
within_expanded AS (
    SELECT a.doc AS id_a, b.doc AS id_b, 1.0 AS jaccard
    FROM mem a JOIN mem b ON a.rep = b.rep AND a.doc < b.doc
)
SELECT * FROM cross_expanded UNION ALL SELECT * FROM within_expanded
"""

_CLUSTER_CANONICALIZE_SQL = f"""
WITH RECURSIVE {_SHINGLES},
sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BANDS_SQL}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
),
pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
),
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
),
fulls AS (
    SELECT d.doc_id, d.n_chars,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT cluster_id, doc_id AS kept_doc_id, n_members FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (
               PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id DESC
           ) AS rn,
           count(*) OVER (PARTITION BY cluster_id) AS n_members
    FROM fulls
) t WHERE rn = 1
"""

_SPLIT_LEAKAGE_SQL = f"""
WITH {_SHINGLES},
sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BANDS_SQL}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
),
verified AS (
    SELECT i.id_a, i.id_b, i.inter / (sa.n + sb.n - i.inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
)
SELECT id_a, id_b,
       CASE WHEN substring(md5(CAST(id_a AS VARCHAR)), 1, 1) < 'd' THEN 'train'
            WHEN substring(md5(CAST(id_a AS VARCHAR)), 1, 1) < 'f' THEN 'val'
            ELSE 'test' END AS split_a,
       CASE WHEN substring(md5(CAST(id_b AS VARCHAR)), 1, 1) < 'd' THEN 'train'
            WHEN substring(md5(CAST(id_b AS VARCHAR)), 1, 1) < 'f' THEN 'val'
            ELSE 'test' END AS split_b,
       jaccard
FROM verified
WHERE (CASE WHEN substring(md5(CAST(id_a AS VARCHAR)), 1, 1) < 'd' THEN 'train'
            WHEN substring(md5(CAST(id_a AS VARCHAR)), 1, 1) < 'f' THEN 'val'
            ELSE 'test' END)
   <> (CASE WHEN substring(md5(CAST(id_b AS VARCHAR)), 1, 1) < 'd' THEN 'train'
            WHEN substring(md5(CAST(id_b AS VARCHAR)), 1, 1) < 'f' THEN 'val'
            ELSE 'test' END)
"""

_DOC_INCREMENTAL_DEDUP_SQL = f"""
WITH {_SHINGLES},
sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BANDS_SQL}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
est AS (
    SELECT c.id_a, c.id_b,
           ((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END)) / 8.0 AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b
),
dropped AS (SELECT DISTINCT id_b FROM est WHERE est_jaccard >= 0.5)
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM dropped)
"""


_NEARDUP_NGRAM_SQL = f"""
WITH {_SHINGLES},
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter / (sa.n + sb.n - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.8
"""

# prefix filtering is a candidate-pruning strategy only: the qualifying
# pair set is EXACTLY the brute-force join's, so the oracle is the same
# shape at the operator's threshold (0.7)
_NEARDUP_PREFIX_SQL = f"""
WITH {_SHINGLES},
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter / (sa.n + sb.n - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.7
"""

_SIMHASH_BIT_SUMS = ", ".join(
    f"sum(((hv >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(60)
)
_SIMHASH_VALUE = " + ".join(
    f"(CASE WHEN b{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)" for j in range(60)
)

_DOC_SIMHASH_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM tok),
s AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM s
"""

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

_EVENTS_TUMBLING_SQL = f"""
SELECT strftime(time_bucket(INTERVAL 1 hour, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       {money_sum_sql("value")} AS sum_value
FROM events
GROUP BY 1, 2
"""

_TIME_ROLLUP_GRAIN = """
SELECT '{g}' AS grain,
       strftime(time_bucket(INTERVAL {iv}, ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2, 3
"""

_EVENTS_TIME_ROLLUP_SQL = (
    _TIME_ROLLUP_GRAIN.format(g="hour", iv="1 HOUR")
    + " UNION ALL "
    + _TIME_ROLLUP_GRAIN.format(g="day", iv="1 DAY")
)

_EVENTS_SESSIONIZE_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
m AS (
    SELECT user_id, us, value,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w >= 300000000
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
    SELECT user_id, us, value,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING
           ) - 1 AS BIGINT) AS session_id
    FROM m
)
SELECT user_id, session_id,
       min(us) AS session_start_us,
       count(*) AS n_events,
       {money_sum_sql("value")} AS sum_value
FROM s GROUP BY 1, 2
"""


_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       o_orderpriority,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

_LOCAL_SUPPLIER_SQL = f"""
SELECT r_name AS region_name, n_name AS nation_name,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_items
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2
"""

_ERROR_CONTEXT_SQL = """
WITH e AS (
    SELECT user_id, event_id AS error_id,
           epoch_us(ts) - 600000000 AS w_start,
           epoch_us(ts) + 600000000 AS w_end
    FROM events WHERE event_type = 'error'
),
v AS (
    SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
    FROM events WHERE event_type = 'view'
)
SELECT e.user_id, e.error_id,
       count(*) AS n_context_views,
       min(v.view_id) AS first_view_id
FROM e JOIN v
  ON e.user_id = v.user_id
 AND v.view_us >= e.w_start AND v.view_us <= e.w_end
GROUP BY 1, 2
"""

_PURCHASE_LAST_CLICK_SQL = """
WITH p AS (
    SELECT user_id, epoch_us(ts) AS purchase_us, event_id AS purchase_id
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, epoch_us(ts) AS click_us, event_id AS click_id
    FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us
"""

_NEARDUP_SIMHASH_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM tok),
s AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM s),
bands AS (
    SELECT doc_id, simhash, b AS band,
           (simhash >> (15 * b)) & 32767 AS key
    FROM sh, unnest([0, 1, 2, 3]) AS u(b)
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 10
"""

# the exact-recall (pigeonhole-banded) detector provably equals brute
# force, so its oracle IS the all-pairs hamming join — no banding to
# mirror (feasible only at fixture scale; the Spark side stays banded)
_NEARDUP_SIMHASH_EXACT_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM tok),
s AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM s)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
"""

_PRICE_QUANTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95,
       min(l_extendedprice) AS p_min,
       max(l_extendedprice) AS p_max
FROM lineitem GROUP BY 1
"""

_ABOVE_AVG_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
    SELECT o_orderkey, o_custkey, o_totalprice,
           sum(cast(round(o_totalprice * 100) as bigint))
               OVER (PARTITION BY o_custkey) / 100.0
               / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
    FROM orders
) t WHERE o_totalprice > cust_avg
"""

_EMB_STATS_SQL = f"""
SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       sqrt({_DOT.format(a="embedding", b="embedding")}) AS l2_norm
FROM embeddings
"""

_ORDERS_PROFILE_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column_name, "
    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
    f"count(DISTINCT {c}) AS n_distinct FROM orders"
    for c in [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
)

_NATION_RECONCILE_SQL = """
WITH c AS (
    SELECT c_nationkey AS nation_key, count(*) AS n_customers
    FROM customer GROUP BY 1
),
s AS (
    SELECT s_nationkey AS nation_key, count(*) AS n_suppliers
    FROM supplier GROUP BY 1
)
SELECT coalesce(c.nation_key, s.nation_key) AS nation_key,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nation_key = s.nation_key
"""

_SQL_FRONTEND_SQL = """
SELECT c_mktsegment AS segment,
       o_orderstatus AS status,
       count(*) AS n_orders,
       sum(cast(round(o_totalprice * 100) as bigint)) / 100.0 AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
"""

_DEDUP_ANY_COUNT_SQL = """
SELECT l_returnflag, count(*) AS n_distinct_parts FROM (
    SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
) t GROUP BY 1
"""

_GLOBAL_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

_DOC_FINGERPRINTS_SQL = rf"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents)
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS md5_fp,
       list_min(list_transform(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE []::VARCHAR[] END,
           s -> md5(s))) AS winnow_fp,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens
FROM toks
"""

_Y95 = "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
_Y96 = "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"

_CUSTKEYS_BOTH_SQL = f"""
SELECT o_custkey FROM orders WHERE {_Y95}
INTERSECT
SELECT o_custkey FROM orders WHERE {_Y96}
"""

_CUSTKEYS_ONLY_1995_SQL = f"""
SELECT o_custkey FROM orders WHERE {_Y95}
EXCEPT
SELECT o_custkey FROM orders WHERE {_Y96}
"""

_ROLLUP_LOSSES_SQL = f"""
SELECT s_nationkey AS nation_key, l_suppkey AS supp_key,
       {money_sum_sql("l_extendedprice * l_discount")} AS perdas,
       count(*) AS n_rows
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY ROLLUP (nation_key, supp_key)
"""

_SUPPLIER_SHARE_EXPR_SQL = """
SELECT DISTINCT s_nationkey AS nation_key, l_suppkey AS supp_key,
       sum(cast(round(l_extendedprice * 100) as bigint))
           over (partition by l_suppkey) / 100.0 AS supp_total
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
"""

_EVENTS_PROPS_MAP_SQL = """
SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val
FROM events WHERE event_type = 'purchase'
"""

_EVENTS_SLIDING_SQL = """
WITH w AS (
    SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type
    FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       count(*) AS n_events
FROM w GROUP BY 1, 2
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

_SKETCH_STATS_SQL = """
SELECT l_returnflag, count(*) AS n_rows,
       true AS distinct_ok, true AS p50_ok
FROM lineitem GROUP BY l_returnflag
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


_DAILY_DENSE_ORDERS_SQL = """
WITH jan AS (
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
           o_orderpriority AS priority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-02-01'
),
counts AS (SELECT day, priority, count(*) AS n_orders FROM jan GROUP BY 1, 2),
spine AS (
    SELECT CAST(CAST(d AS DATE) AS VARCHAR) AS day, p.priority
    FROM generate_series(DATE '1995-01-01', DATE '1995-01-31',
                         INTERVAL 1 DAY) s(d)
    CROSS JOIN (SELECT DISTINCT priority FROM jan) p
)
SELECT s.day, s.priority, coalesce(c.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN counts c USING (day, priority)
"""

_PRICE_OUTLIERS_SQL = """
WITH dist AS (
  SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v, c,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM dist
), med AS (
  SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS median_price
  FROM cum GROUP BY 1
), dev AS (
  SELECT l.l_returnflag, abs(l.l_extendedprice - m.median_price) AS d
  FROM lineitem l JOIN med m USING (l_returnflag)
), ddist AS (
  SELECT l_returnflag, d, count(*) AS c FROM dev GROUP BY 1, 2
), dcum AS (
  SELECT l_returnflag, d, c,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM ddist
), mad AS (
  SELECT l_returnflag,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN d END) AS mad
  FROM dcum GROUP BY 1
)
SELECT m.l_returnflag, m.n_rows, m.median_price, a.mad,
       coalesce((SELECT count(*) FROM dev
                 WHERE dev.l_returnflag = m.l_returnflag
                   AND dev.d > 10 * a.mad), 0) AS n_outliers
FROM med m JOIN mad a USING (l_returnflag)
"""

_DOC_GROUP_SAMPLE_SQL = """
SELECT doc_id, source, rn FROM (
    SELECT doc_id, source,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS rn
    FROM documents
) t WHERE rn <= 5
"""

_SCD2_CUSTOMER_HISTORY_SQL = """
WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
SELECT c_custkey, c_acctbal,
       '2024-01-01' AS valid_from, NULL AS valid_to, true AS is_current
FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, c_acctbal, '2024-01-01', '2024-02-01', false
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, round(c_acctbal + 100.0, 2), '2024-02-01', NULL, true
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
"""

_DOC_BIGRAM_NOVELTY_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg0 AS (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 2
                  THEN list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1])
                  ELSE []::VARCHAR[] END) AS bigram
    FROM toks
),
bg AS (SELECT DISTINCT doc_id, bigram FROM bg0),
ref AS (
    SELECT bigram, count(*) AS df FROM bg
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
    GROUP BY 1
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(CASE WHEN r.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
       CAST(sum(coalesce(r.df, 0)) AS BIGINT) AS sum_df,
       CAST(sum(CASE WHEN r.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS known_ratio
FROM bg b LEFT JOIN ref r USING (bigram)
GROUP BY b.doc_id
"""

_RETURNS_UNPIVOT_SQL = """
WITH wide AS (
    SELECT l_returnflag,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
               AS revenue,
           CAST(count(*) AS DOUBLE) AS n_rows
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'revenue', revenue FROM wide
UNION ALL
SELECT l_returnflag, 'n_rows', n_rows FROM wide
"""

_SKETCH_ROLLUP_SQL = """
SELECT l_returnflag, count(*) AS n_rows, true AS distinct_ok
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT '__total', count(*), true FROM lineitem
"""

_DISJUNCTIVE_REVENUE_SQL = """
SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
           AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 30
       AND l_quantity BETWEEN 20 AND 40)
"""

_EXCLUSIVE_SUPPLIER_ORDERS_SQL = """
WITH li_n AS (
    SELECT l_orderkey, s_nationkey
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
)
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM li_n WHERE s_nationkey < 5)
  AND o_orderkey NOT IN (SELECT l_orderkey FROM li_n
                         WHERE s_nationkey >= 5 AND l_orderkey IS NOT NULL)
GROUP BY o_orderpriority
"""

_PART_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""

_RICH_IDLE_CUSTOMERS_SQL = """
WITH avg_bal AS (
    SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) / (count(*) * 100.0)
               AS ab
    FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_customers,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
FROM customer, avg_bal
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal > ab
  -- IS NOT NULL guard: o_custkey carries NULLs, and a NULL-poisoned
  -- NOT IN silently empties the result (anti-join semantics intended)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_custkey IS NOT NULL
                          AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c_mktsegment
"""

_USER_ROLLING_VALUE_SQL = """
WITH e AS (
    SELECT user_id, event_id,
           epoch_us(ts) // 86400000000 AS day,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT user_id, event_id, day,
       sum(cents) OVER (
           PARTITION BY user_id ORDER BY day
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) / 100.0 AS week_value
FROM e
"""

_SESSION_PATHS_SQL = """
WITH e AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
m AS (
    SELECT *, CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w >= 300000000
                   THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
    SELECT *, CAST(sum(is_new) OVER (
                  PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING
              ) - 1 AS BIGINT) AS session_id
    FROM m
),
r AS (
    SELECT *, row_number() OVER (
                  PARTITION BY user_id, session_id ORDER BY us, event_id
              ) AS rn
    FROM s
)
SELECT user_id, session_id,
       string_agg(event_type, '>' ORDER BY us, event_id) AS path,
       coalesce(
           min(CASE WHEN event_type = 'view' THEN rn END)
           < max(CASE WHEN event_type = 'purchase' THEN rn END),
           false
       ) AS converted
FROM r GROUP BY user_id, session_id
"""

_CUSTOMER_ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       date_diff('day',
                 CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS gap_days,
       ntile(4) OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey) AS value_quartile,
       percent_rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice, o_orderkey) AS value_prank
FROM orders
"""

_CUSTOMER_YEAR_ARRAYS_SQL = """
WITH ys AS (
  SELECT o_custkey,
         list_sort(list(DISTINCT year(o_orderdate))) AS ys
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       array_to_string(ys, ',') AS years_csv,
       CAST(len(ys) AS INT) AS n_years,
       CAST(len(list_filter(ys, y -> y >= 1996)) AS INT) AS n_years_since_1996
FROM ys
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

_BUCKET1 = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
_BUCKET2 = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"

_DOC_SPLIT_COUNTS_SQL = f"""
SELECT CASE WHEN {_BUCKET1} < 'd' THEN 'train'
            WHEN {_BUCKET1} < 'f' THEN 'val'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""

_DOC_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE CASE lang WHEN 'en' THEN {_BUCKET2} < '40'
                WHEN 'zh' THEN {_BUCKET2} < 'c0'
                ELSE {_BUCKET2} < 'ff' END
"""

_DOC_GROUP_SPLIT_SQL = """
SELECT source,
       CASE WHEN substring(md5(source), 1, 1) < 'd' THEN 'train'
            WHEN substring(md5(source), 1, 1) < 'f' THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""

_DOC_REPETITION_SQL = rf"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
    SELECT doc_id, t,
           CASE WHEN len(t) >= 3
                THEN list_transform(generate_series(1, len(t) - 2),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END AS s
    FROM base
)
SELECT doc_id,
       len(t)::BIGINT AS n_words,
       len(list_distinct(t))::BIGINT AS n_uniq_words,
       len(s)::BIGINT AS n_3grams,
       len(list_distinct(s))::BIGINT AS n_uniq_3grams,
       round(CASE WHEN len(t) > 0
                  THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                             / CAST(len(t) AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_word_frac,
       round(CASE WHEN len(s) > 0
                  THEN 1.0 - CAST(len(list_distinct(s)) AS DOUBLE)
                             / CAST(len(s) AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_3gram_frac
FROM sh
"""

_DOC_PII_SCRUB_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::VARCHAR
                      || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 1 THEN ' call +55 '
                      || (doc_id % 7000 + 3000)::VARCHAR || '-'
                      || (doc_id % 9000 + 1000)::VARCHAR ELSE '' END
         || CASE WHEN doc_id % 5 = 2 THEN ' card 4012-8888-8888-'
                      || (doc_id % 9000 + 1000)::VARCHAR ELSE '' END
         || CASE WHEN doc_id % 7 = 3 THEN ' from 10.'
                      || (doc_id % 256)::VARCHAR || '.0.'
                      || (doc_id % 100)::VARCHAR ELSE '' END
         AS pii_text
  FROM documents
),
{scrub_pii_sql_stages("pii_text", "injected")}
SELECT doc_id, n_email, n_ipv4, n_cc, n_phone,
       length(clean_text)::BIGINT AS n_chars_clean,
       md5(clean_text) AS clean_checksum
FROM pii_s4
"""

_SOURCE_MIX_SAMPLE_SQL = """
WITH counts AS (
  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs,
         CAST(round(sqrt(n_docs) * 1000000) AS BIGINT) AS w
  FROM counts
), t AS (
  SELECT source, n_docs, w, CAST(sum(w) OVER () AS BIGINT) AS tot FROM w
), kept AS (
  SELECT d.source
  FROM documents d JOIN t ON d.source = t.source
  WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 6))::BIGINT)::HUGEINT
          * t.tot::HUGEINT * t.n_docs::HUGEINT
        < 150::HUGEINT * t.w::HUGEINT * 16777216::HUGEINT
), kc AS (
  SELECT source, count(*)::BIGINT AS n_kept FROM kept GROUP BY source
)
SELECT t.source, t.n_docs, coalesce(kc.n_kept, 0)::BIGINT AS n_kept
FROM t LEFT JOIN kc USING (source)
"""

_DOC_CHUNKS_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
st AS (
  SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s // 24 AS BIGINT) AS chunk_no,
       array_to_string(list_slice(t, s + 1, least(s + 32, len(t))), ' ')
           AS chunk_text,
       CAST(least(s + 32, len(t)) - s AS BIGINT) AS n_chunk_tokens
FROM st
"""

_DOC_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, source, n_chars::BIGINT AS n_chars
FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY pow(
    ((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE) + 1.0)
        / 1152921504606846977.0,
    1.0 / n_chars::DOUBLE) DESC
LIMIT 50
"""


_SMALL_QTY_REVENUE_SQL = """
WITH caps AS (
  SELECT l_partkey, (sum(l_quantity) / count(*)) * 0.2 AS qty_cap
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
           AS small_qty_revenue,
       count(*)::BIGINT AS n_lineitems
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN caps USING (l_partkey)
WHERE l_quantity < qty_cap
GROUP BY p_brand
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


_PRICE_HISTOGRAM_SQL = """
WITH rng AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20)) AS BIGINT), 19)
           AS bin,
       count(*)::BIGINT AS n_orders
FROM orders, rng
GROUP BY 1
"""

_EVENT_FUNNEL_SQL = """
WITH pu AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN pu USING (user_id)
  WHERE e.event_type = 'click' AND pu.t_view IS NOT NULL AND e.ts > pu.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT count(t_view)::BIGINT AS n_view,
       (SELECT count(*) FROM c)::BIGINT AS n_view_click,
       (SELECT count(*) FROM p)::BIGINT AS n_view_click_purchase
FROM pu
"""

_USER_RETENTION_COHORTS_SQL = """
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', ts)::DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events
)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       ((week - cohort_week) // 7)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM active JOIN firsts USING (user_id)
GROUP BY 1, 2
"""


_DOC_SHUFFLE_ORDER_SQL = """
WITH first20 AS (
  SELECT doc_id, md5('seed42#' || doc_id::VARCHAR) AS shuffle_key
  FROM documents ORDER BY shuffle_key LIMIT 20
)
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key) AS BIGINT) AS rank
FROM first20
"""

_FUZZY_CODE_MATCH_SQL = """
WITH clean AS (
  SELECT doc_id, substr(md5(doc_id::VARCHAR), 1, 12) AS code FROM documents
), dirty AS (
  SELECT doc_id AS dirty_id,
         substr(code, 1, (doc_id % 8 + 2)::INT)
           || substr(code, (doc_id % 8 + 4)::INT, 12) AS dirty_code
  FROM clean WHERE doc_id % 5 = 0
), pairs AS (
  SELECT d.dirty_id, d.dirty_code, c.doc_id,
         levenshtein(d.dirty_code, c.code) AS dist
  FROM dirty d CROSS JOIN clean c
  WHERE levenshtein(d.dirty_code, c.code) <= 1
)
SELECT dirty_id, dirty_code, count(*)::BIGINT AS n_matches,
       (min(dist * 10000000 + doc_id) // 10000000)::BIGINT AS best_distance,
       (min(dist * 10000000 + doc_id) % 10000000)::BIGINT AS best_match_id
FROM pairs GROUP BY dirty_id, dirty_code
"""

_RETURNS_GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       count(*)::BIGINT AS n_items,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
"""

_MARKET_SHARE_SQL = """
WITH scoped AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN orders ON l_orderkey = o_orderkey
   AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       sum(c)::BIGINT / 100.0 AS total_vol,
       sum(CASE WHEN supp_nation = 'NATION_7' THEN c ELSE 0 END)::BIGINT / 100.0
           AS share_vol,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN c ELSE 0 END)::BIGINT
             / CAST(sum(c)::BIGINT AS DOUBLE), 6) AS mkt_share
FROM scoped GROUP BY o_year
"""

_DATA_QUALITY_SQL = """
WITH one_pass AS (
  SELECT count(*)::BIGINT AS n_rows,
         sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END)::BIGINT AS v_qty,
         sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END)::BIGINT AS v_price,
         sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN 0 ELSE 1 END)::BIGINT AS v_disc,
         sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)::BIGINT AS v_rf,
         sum(CASE WHEN l_linestatus IN ('O','F') THEN 0 ELSE 1 END)::BIGINT AS v_ls
  FROM lineitem
)
SELECT 'qty_range' AS rule, n_rows, v_qty AS n_violations FROM one_pass
UNION ALL SELECT 'price_positive', n_rows, v_price FROM one_pass
UNION ALL SELECT 'discount_range', n_rows, v_disc FROM one_pass
UNION ALL SELECT 'returnflag_domain', n_rows, v_rf FROM one_pass
UNION ALL SELECT 'linestatus_domain', n_rows, v_ls FROM one_pass
UNION ALL SELECT 'orderkey_fk',
       (SELECT count(*)::BIGINT FROM lineitem),
       (SELECT count(*)::BIGINT FROM lineitem l LEFT JOIN orders o
          ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
"""

_DOC_SOURCE_CAP_SQL = """
SELECT source, doc_id, n_chars
FROM (
    SELECT source, doc_id, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
)
WHERE rn <= 5
"""

_VOCAB_TOPK_SQL = f"""
SELECT t AS token, count(*) AS n
FROM (SELECT unnest({_TOKS}) AS t FROM documents)
GROUP BY 1
ORDER BY n DESC, token
LIMIT 50
"""

_DOC_DECONTAMINATE_SQL = rf"""
WITH {_SHINGLES},
ev AS (SELECT DISTINCT s FROM sh WHERE {_BUCKET1} = 'f'),
corpus AS (SELECT doc_id, s FROM sh WHERE {_BUCKET1} <> 'f'),
sizes2 AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
hits AS (
    SELECT c.doc_id, count(*) AS n_hits
    FROM corpus c JOIN ev ON c.s = ev.s
    GROUP BY 1
)
SELECT s2.doc_id,
       s2.n_shingles,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) / s2.n_shingles AS contamination
FROM sizes2 s2 LEFT JOIN hits h USING (doc_id)
"""

_DOC_PACK_SQL = f"""
WITH t AS (
    SELECT doc_id, source,
           CAST({bpe_token_count_sql('text')} AS BIGINT) AS n_tokens
    FROM documents
), o AS (
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS pack_offset
    FROM t
)
SELECT doc_id, source, n_tokens, pack_offset,
       CAST(pack_offset // 256 AS BIGINT) AS pack_id
FROM o
"""

_DOC_TOP_TERMS_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
s AS (
    SELECT t.doc_id, t.token, t.tf, d.doc_freq,
           t.tf / d.doc_freq AS score,
           row_number() OVER (PARTITION BY t.doc_id
                              ORDER BY t.tf / d.doc_freq DESC, t.token) AS rn
    FROM tf t JOIN dfq d USING (token)
)
SELECT doc_id, token, tf, doc_freq, score
FROM s
WHERE rn <= 3
"""

_NEARDUP_CLUSTERS_SQL = rf"""
WITH RECURSIVE {_SHINGLES},
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.8
),
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id
FROM reach
GROUP BY a
"""

_CUSTOMER_SPEND_DECILES_SQL = f"""
WITH spend AS (
    SELECT o_custkey, n_name,
           {money_sum_sql('o_totalprice')} AS total_spend
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT o_custkey, n_name, total_spend,
       ntile(4) OVER w AS spend_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM spend
WINDOW w AS (PARTITION BY n_name ORDER BY total_spend DESC, o_custkey)
"""

_CURATION_BASE_CTES = rf"""stats AS (
    SELECT doc_id, lang, text,
           len({_TOKS}) AS n_tokens,
           round(
             least(1.0, (CAST(len(regexp_extract_all(lower(trim(text)), '{_EN_PAT}')) AS DOUBLE)
                         / CAST(len({_TOKS}) AS DOUBLE)) * 5.0)
             * (1.0 - least(1.0, (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                                  / CAST(length(text) AS DOUBLE)) * 10.0)),
           6) AS quality
    FROM documents
),
kept AS (
    SELECT * FROM stats
    WHERE quality >= 0.15 AND n_tokens BETWEEN 20 AND 10000
),
canon AS (
    SELECT k.* FROM kept k
    JOIN (
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS keep_id
        FROM kept GROUP BY 1
    ) m ON k.doc_id = m.keep_id
),
toks AS (SELECT doc_id, {_TOKS} AS t FROM canon),
sh0 AS (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE []::VARCHAR[] END) AS s
    FROM toks
),
sh AS (SELECT DISTINCT doc_id, s FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""

_CURATION_CTES = (
    _CURATION_BASE_CTES
    + """,
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
neardup AS (
    SELECT DISTINCT i.id_b FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.8
)"""
)

_DOC_CURATION_SQL = f"""
WITH {_CURATION_CTES}
SELECT doc_id, lang, n_tokens, quality FROM canon
WHERE doc_id NOT IN (SELECT id_b FROM neardup)
"""

# The same composite on the production pair stage: minhash banding with
# the bucket_cap=2 star mitigation engaged, threshold 0.8 — the capped
# pipeline (collapse / band / size+hub / cap / verify / expand) is the
# one _NEARDUP_BUCKET_CAP_SQL value-gates in isolation, here run over
# the quality+dedup survivors (canon) inside the composite.
_DOC_CURATION_CAPPED_SQL = f"""
WITH {_CURATION_BASE_CTES},
docsets AS (
    SELECT doc_id, list_sort(list(s)) AS ss FROM sh GROUP BY doc_id
),
fam AS (
    SELECT ss, min(doc_id) AS rep, list(doc_id) AS members_, len(ss) AS n
    FROM docsets GROUP BY ss
),
mem AS (SELECT rep, unnest(members_) AS doc FROM fam),
repsh AS (SELECT rep AS doc_id, unnest(ss) AS s FROM fam),
sig AS (SELECT doc_id, {_MH_COLS} FROM repsh GROUP BY doc_id),
bands AS ({_BANDS_SQL}),
sized AS (
    SELECT doc_id, band, key,
           count(*) OVER (PARTITION BY band, key) AS bsz,
           min(doc_id) OVER (PARTITION BY band, key) AS hub
    FROM bands
),
cand AS (
    SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        WHERE a.bsz <= 2 AND b.bsz <= 2
        UNION ALL
        SELECT hub AS id_a, doc_id AS id_b FROM sized
        WHERE bsz > 2 AND doc_id != hub
    )
),
pinter AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand c
    JOIN repsh x ON x.doc_id = c.id_a
    JOIN repsh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
),
rsizes AS (SELECT rep, n FROM fam),
verified AS (
    SELECT i.id_a, i.id_b
    FROM pinter i
    JOIN rsizes sa ON sa.rep = i.id_a
    JOIN rsizes sb ON sb.rep = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.8
),
dropped AS (
    SELECT DISTINCT id_b FROM (
        SELECT greatest(ma.doc, mb.doc) AS id_b
        FROM verified v
        JOIN mem ma ON ma.rep = v.id_a
        JOIN mem mb ON mb.rep = v.id_b
        UNION ALL
        SELECT b.doc AS id_b
        FROM mem a JOIN mem b ON a.rep = b.rep AND a.doc < b.doc
    )
)
SELECT doc_id, lang, n_tokens, quality FROM canon
WHERE doc_id NOT IN (SELECT id_b FROM dropped)
"""

_DOC_QUALITY_MODEL_SQL = rf"""
SELECT doc_id,
       CAST((round(
             least(1.0, (CAST(len(regexp_extract_all(lower(trim(text)), '{_EN_PAT}')) AS DOUBLE)
                         / CAST(len({_TOKS}) AS DOUBLE)) * 5.0)
             * (1.0 - least(1.0, (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                                  / CAST(length(text) AS DOUBLE)) * 10.0)),
           6) >= 0.15) AS DOUBLE) AS weak_label,
       true AS model_agrees
FROM documents
"""

_DOC_TRAINING_PREP_SQL = f"""
WITH {_CURATION_CTES},
cur AS (
    SELECT doc_id FROM canon
    WHERE doc_id NOT IN (SELECT id_b FROM neardup)
),
toks5 AS (SELECT doc_id, {_TOKS} AS t FROM documents
          WHERE doc_id IN (SELECT doc_id FROM cur)),
shd0 AS (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 5
                  THEN list_transform(range(1, len(t) - 3),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            || ' ' || t[i+3] || ' ' || t[i+4])
                  ELSE []::VARCHAR[] END) AS s
    FROM toks5
),
sh2 AS (SELECT DISTINCT doc_id, s FROM shd0),
ev AS (SELECT DISTINCT s FROM sh2 WHERE {_BUCKET1} = '0'),
corpus AS (SELECT doc_id, s FROM sh2 WHERE {_BUCKET1} <> '0'),
csizes AS (SELECT doc_id, count(*) AS n FROM corpus GROUP BY 1),
hits AS (
    SELECT c.doc_id, count(*) AS h
    FROM corpus c JOIN ev ON c.s = ev.s
    GROUP BY 1
),
contaminated AS (
    SELECT cs.doc_id FROM csizes cs JOIN hits h USING (doc_id)
    WHERE h.h / cs.n >= 0.2
),
clean AS (
    SELECT d.doc_id, d.source, d.text
    FROM documents d JOIN cur USING (doc_id)
    WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <> '0'
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
splitd AS (
    SELECT doc_id, source,
           CASE WHEN {_BUCKET1} < 'd' THEN 'train'
                WHEN {_BUCKET1} < 'f' THEN 'val'
                ELSE 'test' END AS split,
           CAST({bpe_token_count_sql('text')} AS BIGINT) AS n_tokens
    FROM clean
),
packed AS (
    SELECT doc_id, source, split, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY split, source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS pack_offset
    FROM splitd
)
SELECT doc_id, source, split, n_tokens, pack_offset,
       CAST(pack_offset // 256 AS BIGINT) AS pack_id
FROM packed
"""

_ORDER_PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate <  TIMESTAMP '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

_MIN_COST_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice / l_quantity, l_suppkey
                           ) AS rn
  FROM lineitem
)
SELECT p_partkey AS part_key, p_brand AS brand,
       s_suppkey AS supp_key, s_name AS supp_name,
       unit AS best_unit_price
FROM r
JOIN part ON l_partkey = p_partkey AND p_size <= 5
JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
"""

_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""

_PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round((l_extendedprice * (1 - l_discount)
                       - p_retailprice * l_quantity) * 100) AS BIGINT)
          ) / 100.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, o_year
"""

_RETURNED_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          ) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_IMPORTANT_PARTS_SQL = """
WITH v AS (
  SELECT l_partkey AS part_key,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
            ) AS val_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY part_key
)
SELECT part_key, val_c / 100.0 AS value
FROM v
WHERE val_c * (SELECT count(*) FROM v) > (SELECT sum(val_c) FROM v) * 2
"""

_CUSTDIST_SQL = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n
  FROM orders
  WHERE o_orderpriority <> '1-URGENT'
  GROUP BY o_custkey
)
SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_count,
       count(*) AS custdist
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY c_count
"""

_PROMO_REVENUE_SQL = """
WITH s AS (
  SELECT
    sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             ELSE 0 END) AS promo_c,
    sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS all_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-09-01'
    AND l_shipdate <  TIMESTAMP '1995-10-01'
)
SELECT promo_c / 100.0 AS promo_revenue,
       all_c / 100.0 AS total_revenue,
       round(100.0 * promo_c / all_c, 6) AS promo_pct
FROM s
"""

_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
            ) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS supp_key, s_name AS supp_name, rev_c / 100.0 AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT max(rev_c) FROM revenue)
"""

_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING total_qty > 250
)
SELECT c_custkey, c_name, o_orderkey AS order_key,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice AS total_price, CAST(total_qty AS BIGINT) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

_PART_PROMOTION_SUPPLIERS_SQL = """
WITH sp AS (
  SELECT l_partkey, l_suppkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1996-01-01'
  GROUP BY l_partkey, l_suppkey
), pt AS (
  SELECT l_partkey AS pk, sum(sp_qty) AS p_qty FROM sp GROUP BY pk
)
SELECT s_suppkey AS supp_key, s_name AS supp_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sp JOIN pt ON l_partkey = pk
  WHERE sp_qty * 10 > p_qty * 3
)
"""

_ORDERS_PIT_DIMENSION_SQL = """
WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0),
hist AS (
  SELECT c_custkey, c_acctbal,
         '1995-06-01' AS valid_from, NULL AS valid_to
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, c_acctbal, '1995-06-01', '1996-06-01'
  FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, round(c_acctbal + 100.0, 2), '1996-06-01', NULL
  FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       c_acctbal AS acctbal_at_order,
       valid_from AS dim_from
FROM orders
LEFT JOIN hist
  ON o_custkey = c_custkey
 AND valid_from <= strftime(o_orderdate, '%Y-%m-%d')
 AND (valid_to IS NULL OR strftime(o_orderdate, '%Y-%m-%d') < valid_to)
"""

_DOC_LENGTH_WINSOR_SQL = """
WITH dist AS (
  SELECT source, n_chars AS v, count(*) AS c
  FROM documents GROUP BY 1, 2
), cum AS (
  SELECT source, v, c,
         sum(c) OVER (PARTITION BY source ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY source) AS n
  FROM dist
), bands AS (
  SELECT source,
         CAST(min(CASE WHEN cum >= ceil(0.05 * n) THEN v END) AS DOUBLE) AS p05,
         CAST(min(CASE WHEN cum >= ceil(0.95 * n) THEN v END) AS DOUBLE) AS p95
  FROM cum GROUP BY 1
)
SELECT doc_id, d.source, n_chars,
       least(greatest(CAST(n_chars AS DOUBLE), p05), p95) AS winsorized,
       (n_chars < p05 OR n_chars > p95) AS was_clipped
FROM documents d JOIN bands b ON d.source = b.source
"""

_CAST_DECIMAL_POLICY_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE)
         AS price_double,
       CAST(CAST(l_discount AS DECIMAL(9,6)) AS DOUBLE) AS disc_double,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(38,6))
            AS VARCHAR) AS price_dec38,
       strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
         AS ship_ntz
FROM lineitem WHERE l_suppkey <= 5
"""

_MERGE_UPSERT_SQL = """
WITH target AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
         0 AS batch
  FROM customer WHERE c_custkey % 2 = 0
), source AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) + 10000 AS acctbal_cents,
         1 AS batch
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT t.* FROM target t
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.c_custkey = t.c_custkey)
UNION ALL
SELECT * FROM source
"""

_INDEXED_ZORDER_SCAN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey BETWEEN 10 AND 100
  AND o_totalprice BETWEEN 50000.0 AND 150000.0
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

def _windowed_best_sql(lo: str, hi: str, tag: str) -> str:
    """One incremental window of the production loop: the windowed
    best-discounted-sale-per-label selection (same ranking the
    superdesconto oracle uses), tagged with its window. ``periodo`` is
    the ISO date string of the sale, so BETWEEN on strings is the
    date-window filter."""
    return f"""
  SELECT etiqueta, filial, cod_prod, periodo, venda, venda_desconto,
         perc_dsc_cupom, '{tag}' AS src_window
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY etiqueta
        ORDER BY venda_desconto DESC, src_ordem, src_linha
    ) AS rn
    FROM cupom
    WHERE periodo BETWEEN '{lo}' AND '{hi}'
  ) t WHERE rn = 1
"""


_PRODUCTION_DAILY_LOOP_SQL = f"""
WITH cupom AS ({_FEED_SQL.format(st="O")} UNION ALL {_FEED_SQL.format(st="F")}),
w1 AS ({_windowed_best_sql("1995-01-01", "1995-01-31", "w1")}),
w2 AS ({_windowed_best_sql("1995-02-01", "1995-02-28", "w2")}),
-- MERGE ON etiqueta, whole-row replace + insert-unmatched expansion:
-- window-2 rows win; window-1 rows survive only for untouched labels
merged AS (
  SELECT * FROM w2
  UNION ALL
  SELECT * FROM w1
  WHERE NOT EXISTS (SELECT 1 FROM w2 WHERE w2.etiqueta = w1.etiqueta)
)
SELECT m.etiqueta, m.filial, m.cod_prod, m.periodo, m.venda,
       m.venda_desconto, m.perc_dsc_cupom,
       p.p_name AS produto_nome, p.p_brand AS produto_marca,
       p.p_retailprice AS preco_tabela, s.s_name AS fornecedor_nome,
       m.src_window
FROM merged m
JOIN part p ON m.cod_prod = p.p_partkey
JOIN supplier s ON m.filial = s.s_suppkey
"""


_EVENTS_FORWARD_FILL_SQL = """
SELECT event_id, user_id, event_type,
       last_value(CASE WHEN event_type = 'purchase' THEN value END
                  IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_purchase_value
FROM events
"""



def _pagerank_oracle_sql(iters: int = 5, scale: int = 10**12) -> str:
    """Unrolled-CTE mirror of operators.graph.pagerank_exact: one
    (contrib, rank) CTE pair per iteration, same integer recurrence.
    Generated, not handwritten, so the iteration count stays in one
    place."""
    parts = [f"""
WITH pairs AS (
  SELECT DISTINCT 'C' || o_custkey AS a, 'S' || l_suppkey AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1996-01-01'
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
consts AS (SELECT {scale} // count(*) AS init FROM nodes),
r0 AS (SELECT node, CAST((SELECT init FROM consts) AS BIGINT) AS rank_fp
       FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS (
  SELECT e.dst AS node, sum(r.rank_fp // d.deg) AS inc
  FROM edges e
  JOIN r{i-1} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         CAST((SELECT (15 * init) // 100 FROM consts)
              + (85 * coalesce(c.inc, 0)) // 100 AS BIGINT) AS rank_fp
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
)""")
    parts.append(f"""
SELECT node, rank_fp, rank_fp / {scale} AS rank
FROM r{iters}
WHERE node LIKE 'S%'
""")
    return "".join(parts)


_TRADE_PAGERANK_SQL = _pagerank_oracle_sql()

_SUPPLIER_CO_PURCHASE_SQL = """
WITH edges AS (
  SELECT DISTINCT o_custkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1996-01-01'
)
SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
       count(*) AS shared_customers
FROM edges a
JOIN edges b ON a.o_custkey = b.o_custkey AND a.l_suppkey < b.l_suppkey
GROUP BY supp_a, supp_b
HAVING count(*) >= 3
"""

_CONCURRENT_SESSIONS_SQL = """
WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events),
m AS (
    SELECT user_id, ts, us,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w >= 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
sess_ev AS (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING
           ) - 1 AS BIGINT) AS session_id
    FROM m
),
sess AS (
    SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
    FROM sess_ev GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, session_id, s AS ts, 1 AS delta FROM sess
    UNION ALL
    SELECT user_id, session_id, e AS ts, -1 AS delta FROM sess
),
curve AS (
    SELECT ts,
           sum(delta) OVER (
               ORDER BY ts, delta DESC, user_id, session_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS concurrency
    FROM bounds
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       CAST(max(concurrency) AS BIGINT) AS peak_concurrency
FROM curve
GROUP BY hour
"""

_GLOBAL_SPEND_RANK_SQL = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, cents / 100.0 AS total_spend,
       row_number() OVER (ORDER BY cents DESC, o_custkey) AS global_rank
FROM spend
"""

_REPLICA_DRIFT_AUDIT_SQL = """
WITH cust AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
),
replica AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 97 = 0 THEN round(c_acctbal + 1.0, 2)
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM cust WHERE c_custkey % 131 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM cust WHERE c_custkey % 113 = 0
),
lf AS (SELECT c_custkey AS key, c_custkey % 64 AS bkt, CAST(('0x' || substr(md5(concat_ws(chr(31), coalesce(CAST(c_custkey AS VARCHAR), chr(0)), coalesce(CAST(c_name AS VARCHAR), chr(0)), coalesce(CAST(c_nationkey AS VARCHAR), chr(0)), coalesce(CAST(c_acctbal AS VARCHAR), chr(0)), coalesce(CAST(c_mktsegment AS VARCHAR), chr(0)))), 1, 15)) AS BIGINT) AS fp FROM cust),
rf AS (SELECT c_custkey AS key, c_custkey % 64 AS bkt, CAST(('0x' || substr(md5(concat_ws(chr(31), coalesce(CAST(c_custkey AS VARCHAR), chr(0)), coalesce(CAST(c_name AS VARCHAR), chr(0)), coalesce(CAST(c_nationkey AS VARCHAR), chr(0)), coalesce(CAST(c_acctbal AS VARCHAR), chr(0)), coalesce(CAST(c_mktsegment AS VARCHAR), chr(0)))), 1, 15)) AS BIGINT) AS fp FROM replica),
ldig AS (SELECT bkt, count(*) AS n, bit_xor(fp) AS d FROM lf GROUP BY bkt),
rdig AS (SELECT bkt, count(*) AS n, bit_xor(fp) AS d FROM rf GROUP BY bkt),
bad AS (
  SELECT coalesce(l.bkt, r.bkt) AS bkt
  FROM ldig l FULL OUTER JOIN rdig r ON l.bkt = r.bkt
  WHERE NOT (l.n IS NOT DISTINCT FROM r.n AND l.d IS NOT DISTINCT FROM r.d)
),
lb AS (SELECT key, fp FROM lf WHERE bkt IN (SELECT bkt FROM bad)),
rb AS (SELECT key, fp FROM rf WHERE bkt IN (SELECT bkt FROM bad))
SELECT coalesce(lb.key, rb.key) AS key,
       CASE WHEN rb.key IS NULL THEN 'left_only'
            WHEN lb.key IS NULL THEN 'right_only'
            WHEN lb.fp <> rb.fp THEN 'modified' END AS change_type
FROM lb FULL OUTER JOIN rb ON lb.key = rb.key
WHERE (CASE WHEN rb.key IS NULL THEN 'left_only'
            WHEN lb.key IS NULL THEN 'right_only'
            WHEN lb.fp <> rb.fp THEN 'modified' END) IS NOT NULL
"""

_CUSTOMER_ORDER_DOCS_SQL = """
WITH docs AS (
  SELECT o_custkey,
         list_sort(list(struct_pack(
             k := o_orderkey,
             c := CAST(round(o_totalprice * 100) AS BIGINT)))) AS orders,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_urgent
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       len(orders) AS n_orders,
       len(list_filter(orders, o -> o.c > 3000000)) AS n_big_orders,
       len(list_filter(orders, o -> o.c > 5000000)) > 0 AS has_jumbo,
       list_sum(list_transform(orders, o -> o.c)) / 100.0 AS total_spend,
       orders[1].k AS first_order_key,
       n_urgent
FROM docs
"""

_DOC_BUDGET_MIX_SQL = """
WITH c AS (
  SELECT source, lang, source || '|' || lang AS stratum,
         count(*) AS n_docs
  FROM documents GROUP BY source, lang
),
tot AS (SELECT sum(n_docs) AS w FROM c),
fl AS (
  SELECT source, lang, stratum, n_docs,
         (200 * n_docs) // w AS flr,
         (200 * n_docs) % w AS rem
  FROM c, tot
),
lo AS (SELECT 200 - sum(flr) AS leftover FROM fl)
SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(flr + CASE WHEN row_number()
                           OVER (ORDER BY rem DESC, stratum)
                       <= (SELECT leftover FROM lo)
                  THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM fl
"""

_FORECAST_REVENUE_SQL = """
SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0
           AS revenue_effect,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_REVENUE_CUBE_SQL = f"""
SELECT l_returnflag AS flag, l_linestatus AS status,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (flag, status)
"""

_PRIORITY_RETURN_PIVOT_SQL = """
SELECT o_orderpriority AS priority,
       -- BIGINT cast: DuckDB integer sums widen to HUGEINT, which pandas
       -- renders as float and would break the stringified value hash
       CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY priority
"""

_CORR_EXACT_SQL = """
WITH d AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS HUGEINT) AS x,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag, count(*)::HUGEINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM d GROUP BY l_returnflag
), c AS (
  -- int -> double via VARCHAR: strtod is correctly rounded, matching
  -- Spark's decimal->double cast; DuckDB's direct HUGEINT->DOUBLE is not
  SELECT l_returnflag, n::BIGINT AS n,
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS numd,
         CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS denxd,
         CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS denyd
  FROM s
)
SELECT l_returnflag, n,
       numd / nullif(sqrt(denxd * denyd), 0.0) AS corr_qty_price
FROM c
"""


_PARETO_PARTS_SQL = """
SELECT p_size, p_partkey, p_retailprice FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size AND q.p_retailprice >= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice > p.p_retailprice)
)
"""

_INVERTED_INDEX_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
pd AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS total_tf,
         array_to_string(list_sort(list(doc_id)), ',') AS postings_csv
  FROM pd GROUP BY term
)
SELECT * FROM agg WHERE df BETWEEN 2 AND 40
"""


def _benford_expected_sql() -> str:
    import math

    whens = " ".join(
        f"WHEN digit = '{d}' THEN {math.log10(1 + 1 / d)!r}"
        for d in range(1, 10)
    )
    return f"CASE {whens} END"


_BENFORD_TOTALPRICE_SQL = f"""
WITH c AS (
  SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice >= 1 GROUP BY 1
), s AS (
  SELECT digit, CAST(n AS BIGINT) AS n,
         CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share,
         {_benford_expected_sql()} AS expected
  FROM c
)
SELECT digit, n, share, expected, abs(share - expected) AS abs_dev FROM s
"""

_EXACT_PRICE_QUARTILES_SQL = """
WITH dist AS (
  SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v, c,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM dist
)
SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
       min(CASE WHEN cum >= ceil(0.25 * n) THEN v END) AS q25,
       min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS q50,
       min(CASE WHEN cum >= ceil(0.75 * n) THEN v END) AS q75
FROM cum GROUP BY l_returnflag
"""

_KS_TEST_AB_SQL = """
WITH d AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), dist AS (
  SELECT cents,
         count(*) FILTER (variant = 'A') AS ca,
         count(*) FILTER (variant <> 'A') AS cb
  FROM d GROUP BY 1
), cum AS (
  SELECT cents,
         sum(ca) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         sum(cb) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
  FROM dist
), t AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM dist
)
SELECT n_a, n_b,
       max(abs(CAST(cuma AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(cumb AS DOUBLE) / CAST(n_b AS DOUBLE))) AS d_stat
FROM cum, t GROUP BY n_a, n_b
"""

_EVENTS_PROPS_VARIANT_SQL = """
WITH k AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS k_sum,
       min(k) AS k_min,
       max(k) AS k_max
FROM k GROUP BY event_type
"""

# regenerates the synthetic DataSource corpus: same integer arithmetic
# as sources/pydatasource.py (_MULT/_MOD)
_PYDS_SOURCE_STATS_SQL = """
WITH ids AS (SELECT range AS doc_id FROM range(5000)),
d AS (
  SELECT doc_id, 's' || CAST(doc_id % 5 AS VARCHAR) AS source,
         (doc_id * 2654435761) % 997 AS n_chars
  FROM ids
)
SELECT source, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       min(doc_id) AS first_id, max(doc_id) AS last_id
FROM d GROUP BY source
"""


_TIME_WEIGHTED_VALUE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), seg AS (
  SELECT user_id, us, cents,
         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_us
  FROM ev
), s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_segments,
         CAST(sum(next_us - us) AS BIGINT) AS active_us,
         sum(cents * (next_us - us)) AS wsum
  FROM seg WHERE next_us IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_segments, active_us,
       CAST(CAST(wsum AS VARCHAR) AS DOUBLE) / CAST(active_us AS DOUBLE)
         AS tw_cents
FROM s
"""

_MONTHLY_REVENUE_MOM_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT month, revenue_cents,
       lag(revenue_cents) OVER (ORDER BY month) AS prev_cents,
       revenue_cents - lag(revenue_cents) OVER (ORDER BY month)
         AS delta_cents,
       CAST(revenue_cents - lag(revenue_cents) OVER (ORDER BY month)
            AS DOUBLE)
         / CAST(lag(revenue_cents) OVER (ORDER BY month) AS DOUBLE)
         AS mom_pct
FROM m
"""

_ABC_CLASSIFICATION_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT l_partkey, revenue_cents,
         CAST(sum(revenue_cents) OVER (
           ORDER BY revenue_cents DESC, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_cents,
         (SELECT CAST(sum(revenue_cents) AS BIGINT) FROM rev) AS total
  FROM rev
)
SELECT l_partkey, revenue_cents, cum_cents,
       CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE) < 0.8
              THEN 'A'
            WHEN CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE) < 0.95
              THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum
"""


_CONVERSION_LATENCY_SQL = """
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), conv AS (
  SELECT strftime(make_timestamp(s.signup_us), '%Y-%m-%d') AS cohort_day,
         min(p.p_us) - s.signup_us AS latency_us
  FROM s JOIN p ON s.user_id = p.user_id AND p.p_us >= s.signup_us
  GROUP BY s.user_id, s.signup_us
), dist AS (
  SELECT cohort_day, latency_us AS v, count(*) AS c FROM conv GROUP BY 1, 2
), cum AS (
  SELECT cohort_day, v, c,
         sum(c) OVER (PARTITION BY cohort_day ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY cohort_day) AS n
  FROM dist
)
SELECT cohort_day, CAST(max(n) AS BIGINT) AS n,
       min(CASE WHEN cum >= ceil(0.25 * n) THEN v END) AS q25,
       min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS q50,
       min(CASE WHEN cum >= ceil(0.75 * n) THEN v END) AS q75
FROM cum GROUP BY cohort_day
"""

_PART_COOCCURRENCE_COSINE_SQL = """
WITH inc_all AS (
  SELECT DISTINCT o_custkey, l_partkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), inc AS (
  SELECT o_custkey, l_partkey FROM inc_all
  WHERE o_custkey NOT IN (
    SELECT o_custkey FROM inc_all GROUP BY 1 HAVING count(*) > 200
  )
), deg AS (
  SELECT l_partkey, count(*) AS n FROM inc GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM inc a JOIN inc b
    ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT part_a, part_b, shared,
       CAST(shared AS DOUBLE)
         / sqrt(CAST(da.n * db.n AS DOUBLE)) AS cosine
FROM pairs
JOIN deg da ON da.l_partkey = part_a
JOIN deg db ON db.l_partkey = part_b
"""


_CHI2_TYPE_VARIANT_SQL = """
WITH d AS (
  SELECT event_type,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant
  FROM events
), cells AS (
  SELECT event_type, variant, count(*) AS o FROM d GROUP BY 1, 2
), r AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
c AS (SELECT variant, sum(o) AS c FROM cells GROUP BY 1),
t AS (
  SELECT sum(o) AS N, count(DISTINCT event_type) AS n_rows,
         count(DISTINCT variant) AS n_cols
  FROM cells
), j AS (
  -- factored (num/den)*num, never num^2 in integer: mirrors the Spark
  -- side op-for-op (VARCHAR route = correctly-rounded HUGEINT->DOUBLE)
  SELECT cells.event_type || '|' || cells.variant AS k,
         (CAST(CAST(o * N - r.r * c.c AS VARCHAR) AS DOUBLE)
           / CAST(CAST(N * r.r * c.c AS VARCHAR) AS DOUBLE))
           * CAST(CAST(o * N - r.r * c.c AS VARCHAR) AS DOUBLE) AS ct,
         N, n_rows, n_cols
  FROM cells JOIN r USING (event_type) JOIN c USING (variant), t
), f AS (
  SELECT list_reduce(
           list_transform(list_sort(list({'k': k, 'ct': ct})), x -> x.ct),
           (a, b) -> a + b
         ) AS chi2,
         CAST(max(N) AS BIGINT) AS n,
         max(n_rows) AS n_rows, max(n_cols) AS n_cols
  FROM j
)
SELECT n, chi2,
       CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
       sqrt(chi2 / CAST(n * least(n_rows - 1, n_cols - 1) AS DOUBLE))
         AS cramers_v
FROM f
"""

_CUSTOMER_SPEND_GINI_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS rk
  FROM spend
), s AS (
  SELECT count(*) AS n, sum(cents) AS sx, sum(rk * cents) AS six
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
       CAST(CAST(2 * six - (n + 1) * sx AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * sx AS VARCHAR) AS DOUBLE) AS gini
FROM s
"""


def _bm25_oracle() -> str:
    from etl_spark_spark.operators.retrieval import bm25_topk_sql

    return bm25_topk_sql("documents", "doc_id", "text", _BM25_TERMS, k=15)


def _surprisal_oracle() -> str:
    from etl_spark_spark.operators.lm import unigram_surprisal_sql

    return unigram_surprisal_sql("documents", "doc_id", "text")


def _emb_covariance_oracle() -> str:
    from etl_spark_spark.operators.stats import embedding_covariance_sql

    return embedding_covariance_sql("embeddings", "embedding")


def _dsir_weights_oracle() -> str:
    from etl_spark_spark.operators.lm import dsir_log_weights_sql

    return dsir_log_weights_sql(
        "documents", "doc_id", "text", "source = 'src0'"
    )


def _bigram_surprisal_oracle() -> str:
    from etl_spark_spark.operators.lm import bigram_surprisal_sql

    return bigram_surprisal_sql("documents", "doc_id", "text")


_DUPLICATE_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 8
                THEN list_transform(range(1, len(t) - 6),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                          t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                          t[i+6] || ' ' || t[i+7])
                ELSE []::VARCHAR[] END) AS s
  FROM toks
), sh AS (
  SELECT DISTINCT doc_id, md5(s) AS h FROM sh0
), sizes AS (
  SELECT d.doc_id, count(sh.h) AS n_spans
  FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
  GROUP BY 1
), dfc AS (
  SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), shared AS (
  SELECT sh.doc_id, count(*) AS n_shared
  FROM sh JOIN dfc USING (h) GROUP BY 1
)
SELECT s.doc_id, CAST(s.n_spans AS BIGINT) AS n_spans,
       CAST(coalesce(x.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN s.n_spans > 0
            THEN CAST(coalesce(x.n_shared, 0) AS DOUBLE)
                 / CAST(s.n_spans AS DOUBLE)
            ELSE 0.0 END AS shared_frac
FROM sizes s LEFT JOIN shared x ON x.doc_id = s.doc_id
"""


_MANN_WHITNEY_AB_SQL = """
WITH d AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), dist AS (
  SELECT cents,
         count(*) FILTER (variant = 'A') AS ca,
         count(*) FILTER (variant <> 'A') AS cb
  FROM d GROUP BY 1
), cum AS (
  SELECT ca, cb, ca + cb AS nv,
         sum(ca + cb) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumn
  FROM dist
), agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         CAST(sum(cb) AS BIGINT) AS n_b,
         CAST(sum(ca * (2 * (cumn - nv) + nv + 1)) AS BIGINT) AS ra2,
         CAST(sum(nv * nv * nv - nv) AS BIGINT) AS tie_term
  FROM cum
)
SELECT n_a, n_b,
       CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
       tie_term,
       (CAST(ra2 - n_a * (n_a + 1) AS DOUBLE)
        - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
            * (CAST(n_a + n_b + 1 AS DOUBLE)
               - CAST(tie_term AS DOUBLE)
                 / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)))) AS z
FROM agg
"""


_SUPPLIER_REACH_BFS_SQL = """
WITH RECURSIVE bip AS (
  SELECT DISTINCT o.o_custkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-01-01'
), e AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM bip a JOIN bip b
    ON a.o_custkey = b.o_custkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), und AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT dst AS a, src AS b FROM e
), walk(node, hops) AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT u.b AS node, w.hops + 1 AS hops
  FROM walk w JOIN und u ON u.a = w.node
  WHERE w.hops < 3
)
SELECT node, CAST(min(hops) AS INTEGER) AS hops FROM walk GROUP BY 1
"""


def _entropy_col_sql(col: str, tbl: str) -> str:
    return f"""
SELECT '{col}' AS column_name, CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(round((ln(CAST(sum(c) AS DOUBLE))
                   - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                     / CAST(sum(c) AS DOUBLE)) * 1e6) AS BIGINT)
         AS entropy_micro
FROM (SELECT CAST({col} AS VARCHAR) AS v, count(*) AS c
      FROM {tbl} GROUP BY 1)"""


_COLUMN_ENTROPY_SQL = " UNION ALL ".join(
    [
        _entropy_col_sql("o_orderstatus", "orders"),
        _entropy_col_sql("o_orderpriority", "orders"),
        _entropy_col_sql("lang", "documents"),
        _entropy_col_sql("source", "documents"),
    ]
)


_PRIORITY_LINES_BY_STATUS_SQL = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY 1
"""


_WAITING_SUPPLIERS_SQL = """
WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
), per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_os p
JOIN per_order q ON p.l_orderkey = q.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.late = 1 AND q.n_supp >= 2 AND q.n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 10
"""


_MV_ROUTED_REVENUE_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY 1
"""


_CUMULATIVE_NEW_CUSTOMERS_SQL = """
WITH first AS (
  SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m')) AS month
  FROM orders GROUP BY 1
), monthly AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_new FROM first GROUP BY 1
)
SELECT month, n_new,
       CAST(sum(n_new) OVER (ORDER BY month
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum_customers
FROM monthly
"""


_ORDER_VALUE_POSITION_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-07-01'
WINDOW w AS (PARTITION BY strftime(o_orderdate, '%Y-%m')
             ORDER BY o_totalprice)
"""


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


def _phrase_search_oracle() -> str:
    from etl_spark_spark.operators.retrieval import phrase_occurrences_sql

    hit = phrase_occurrences_sql("t", ["hash", "join"])
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), c AS (
  SELECT doc_id, CAST({hit} AS INTEGER) AS n_occ FROM toks
)
SELECT doc_id, n_occ FROM c WHERE n_occ > 0
"""


_WEIGHTED_PRICE_QUARTILES_SQL = """
WITH d AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
), dist AS (
  SELECT l_returnflag, v, sum(w) AS w FROM d GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cumw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM dist
)
SELECT l_returnflag, CAST(max(tw) AS BIGINT) AS total_weight,
       min(CASE WHEN cumw >= ceil(0.25 * tw) THEN v END) AS wq25,
       min(CASE WHEN cumw >= ceil(0.5 * tw) THEN v END) AS wq50,
       min(CASE WHEN cumw >= ceil(0.75 * tw) THEN v END) AS wq75
FROM cum GROUP BY 1
"""


_DAU_MAU_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), dau AS (
  SELECT d AS day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1
), contrib AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                                     CAST(d AS TIMESTAMP) + INTERVAL 27 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM ud
), mau AS (
  SELECT day, count(DISTINCT user_id) AS mau FROM contrib GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(dau AS BIGINT) AS dau, CAST(mau AS BIGINT) AS mau,
       CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
FROM dau JOIN mau USING (day)
"""


_REVENUE_AUTOCORR_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS cents
  FROM orders GROUP BY 1
), pairs AS (
  SELECT a.cents AS x, b.cents AS y
  FROM daily a JOIN daily b ON b.day = a.day + 1
), s AS (
  SELECT count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM pairs
), c AS (
  -- int -> double via VARCHAR: strtod is correctly rounded, matching
  -- Spark's decimal->double cast
  SELECT n::BIGINT AS n,
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS numd,
         CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS denxd,
         CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS denyd
  FROM s
)
SELECT n, numd / nullif(sqrt(denxd * denyd), 0.0) AS autocorr_1d FROM c
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


_REVENUE_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), cum AS (
  SELECT day,
         sum(cents) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS scum,
         row_number() OVER (ORDER BY day) AS t
  FROM daily
), tot AS (
  SELECT CAST(sum(cents) AS BIGINT) AS s, count(*) AS n FROM daily
), g AS (
  SELECT strftime(day, '%Y-%m-%d') AS split_day,
         CAST(t AS BIGINT) AS n_left,
         CAST(n - t AS BIGINT) AS n_right,
         CAST(scum AS DOUBLE) / CAST(t AS DOUBLE) AS mean_left_cents,
         CAST(s - scum AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))
           AS mean_right_cents,
         CAST(t AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))
           / CAST(n AS DOUBLE)
           * (CAST(scum AS DOUBLE) / CAST(t AS DOUBLE)
              - CAST(s - scum AS DOUBLE)
                / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)))
           * (CAST(scum AS DOUBLE) / CAST(t AS DOUBLE)
              - CAST(s - scum AS DOUBLE)
                / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))) AS g_stat
  FROM cum, tot WHERE t < n
)
SELECT * FROM g ORDER BY g_stat DESC, split_day LIMIT 1
"""


def _bpe_merges_oracle() -> str:
    from etl_spark_spark.operators.bpe import train_bpe_sql

    return train_bpe_sql("documents", "text", n_merges=6)


def _bpe_token_counts_oracle() -> str:
    from etl_spark_spark.operators.bpe import bpe_token_counts_sql

    return bpe_token_counts_sql("documents", "doc_id", "text", n_merges=6)


_DOC_CONTAINMENT_SQL_TMPL = """
WITH {shingles},
sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
bands AS ({bands}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, CAST(i.inter AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(i.inter AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
         AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.inter AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.7
"""


_BASKET_RULES_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
totals AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b),
items AS (SELECT l_partkey, count(*) AS n FROM b GROUP BY 1),
pairs AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS support
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, support FROM pairs
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, support FROM pairs
)
SELECT r.antecedent, r.consequent, CAST(r.support AS BIGINT) AS support,
       CAST(na.n AS BIGINT) AS n_ant, CAST(nc.n AS BIGINT) AS n_con,
       CAST(r.support AS DOUBLE) / CAST(na.n AS DOUBLE) AS confidence,
       CAST(r.support * t.nb AS DOUBLE) / CAST(na.n * nc.n AS DOUBLE)
         AS lift
FROM rules r
JOIN items na ON na.l_partkey = r.antecedent
JOIN items nc ON nc.l_partkey = r.consequent
CROSS JOIN totals t
"""


_TERM_PMI_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
    FROM documents
  )
), dfc AS (
  SELECT term, count(*) AS df FROM dt GROUP BY 1
), tot AS (
  SELECT count(DISTINCT doc_id) AS n FROM dt
), mid AS (
  SELECT term, df FROM dfc, tot WHERE df >= 2 AND df * 10 <= n * 9
), dtm AS (
  SELECT dt.doc_id, dt.term, m.df FROM dt JOIN mid m USING (term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         a.df AS df_a, b.df AS df_b, count(*) AS c_ab
  FROM dtm a JOIN dtm b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3
)
SELECT term_a, term_b, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
       CAST(round(ln(CAST(c_ab * n AS DOUBLE)
                     / CAST(df_a * df_b AS DOUBLE)) * 1e6) AS BIGINT)
         AS pmi_micro
FROM pairs, tot
ORDER BY pmi_micro DESC, term_a, term_b
LIMIT 50
"""


def _mh_cols_sql(num_perms: int) -> str:
    """min-of-salted-md5 signature columns — the DuckDB mirror of
    operators.neardup.minhash_signature at an arbitrary perm count."""
    return ", ".join(
        f"min(md5('{p}~' || s)) AS mh{p}" for p in range(num_perms)
    )


def _bands_sql_for(num_perms: int, rows_per_band: int, sig: str) -> str:
    """Band/key rows for arbitrary (num_perms, rows_per_band) — the
    mirror of operators.neardup.lsh_candidate_pairs' banding."""
    parts = []
    for b in range(num_perms // rows_per_band):
        key = " || '#' || ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        parts.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM {sig}")
    return " UNION ALL ".join(parts)


def _neardup_eval_tuned_sql() -> str:
    """Oracle for the tuned q_neardup_eval: one row per threshold in
    _EVAL_THRESHOLDS, banding derived by the SAME plan_banding call the
    Spark side uses (imported, not duplicated — the S-curve math is
    pinned once). Exact ground truth computed once at the floor
    threshold with its jaccard kept, filtered per row."""
    from etl_spark_spark.operators.neardup import plan_banding

    floor = min(_EVAL_THRESHOLDS)
    blocks = []
    selects = []
    for t in _EVAL_THRESHOLDS:
        np_, r = plan_banding(t, _EVAL_TARGET_RECALL, _EVAL_MAX_PERMS)
        tag = int(round(t * 100))
        blocks.append(
            f"""
sig_{tag} AS (SELECT doc_id, {_mh_cols_sql(np_)} FROM sh GROUP BY doc_id),
bands_{tag} AS ({_bands_sql_for(np_, r, f'sig_{tag}')}),
cand_{tag} AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands_{tag} a JOIN bands_{tag} b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
linter_{tag} AS (
    SELECT c.id_a, c.id_b, count(*) AS inter
    FROM cand_{tag} c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2
),
lsh_{tag} AS (
    SELECT i.id_a, i.id_b
    FROM linter_{tag} i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.inter / (sa.n + sb.n - i.inter) >= {t}
),
s_{tag} AS (
  SELECT (SELECT count(*) FROM exact_pairs WHERE jaccard >= {t}) AS n_exact,
         (SELECT count(*) FROM lsh_{tag}) AS n_lsh,
         (SELECT count(*) FROM exact_pairs e
            JOIN lsh_{tag} l ON l.id_a = e.id_a AND l.id_b = e.id_b
            WHERE e.jaccard >= {t}) AS n_tp
)"""
        )
        selects.append(
            f"""
SELECT CAST({tag} AS BIGINT) AS threshold_pct,
       CAST({np_} AS BIGINT) AS num_perms,
       CAST({r} AS BIGINT) AS rows_per_band,
       CAST(n_exact AS BIGINT) AS n_exact, CAST(n_lsh AS BIGINT) AS n_lsh,
       CAST(n_tp AS BIGINT) AS n_tp,
       CAST(n_tp AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall,
       CAST(n_tp AS DOUBLE) / CAST(n_lsh AS DOUBLE) AS precision
FROM s_{tag}"""
        )
    return (
        "WITH "
        + _SHINGLES
        + """,
exact0 AS (
    SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
    FROM sh x JOIN sh y ON y.s = x.s AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
exact_pairs AS (
    SELECT e.id_a, e.id_b, e.inter / (sa.n + sb.n - e.inter) AS jaccard
    FROM exact0 e
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    WHERE e.inter / (sa.n + sb.n - e.inter) >= """
        + str(floor)
        + "),"
        + ",".join(blocks)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def _neardup_recall_sampled_sql() -> str:
    """Oracle for q_neardup_recall_sampled: the identical collapse ->
    hash-sample -> exact-verify -> tuned-LSH-compare pipeline in
    DuckDB. The pair sample uses the same md5-hex->int64 hash as the
    Spark side (_pair_hash), so the sample is the same set of pairs;
    the collapse mirrors collapse_identical_sets (families keyed by
    the full sorted shingle set, rep = min doc_id)."""
    from etl_spark_spark.operators.neardup import plan_banding

    np_, r = plan_banding(0.5, _EVAL_TARGET_RECALL, _EVAL_MAX_PERMS)
    pair_mod = 4
    return (
        "WITH "
        + _SHINGLES
        + f""",
setsig AS (
  SELECT doc_id, md5(string_agg(s, chr(1) ORDER BY s)) AS fam
  FROM sh GROUP BY doc_id
),
reps AS (SELECT fam, min(doc_id) AS rid FROM setsig GROUP BY fam),
rsh AS (SELECT s.doc_id, s.s FROM sh s JOIN reps r ON r.rid = s.doc_id),
rsizes AS (SELECT doc_id, count(*) AS n FROM rsh GROUP BY doc_id),
sampled AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rsh a JOIN rsh b ON b.s = a.s AND a.doc_id < b.doc_id
  WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR) || '#'
                            || CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT
        % {pair_mod} = 0
),
tinter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM sampled c
  JOIN rsh x ON x.doc_id = c.id_a
  JOIN rsh y ON y.doc_id = c.id_b AND y.s = x.s
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b
  FROM tinter i
  JOIN rsizes sa ON sa.doc_id = i.id_a
  JOIN rsizes sb ON sb.doc_id = i.id_b
  WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
),
sig AS (SELECT doc_id, {_mh_cols_sql(np_)} FROM rsh GROUP BY doc_id),
bands AS ({_bands_sql_for(np_, r, 'sig')}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
linter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN rsh x ON x.doc_id = c.id_a
  JOIN rsh y ON y.doc_id = c.id_b AND y.s = x.s
  GROUP BY 1, 2
),
detected AS (
  SELECT i.id_a, i.id_b
  FROM linter i
  JOIN rsizes sa ON sa.doc_id = i.id_a
  JOIN rsizes sb ON sb.doc_id = i.id_b
  WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
),
s AS (
  SELECT (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth t
            JOIN detected d ON d.id_a = t.id_a AND d.id_b = t.id_b)
           AS n_hit
)
SELECT CAST({np_} AS BIGINT) AS num_perms,
       CAST({r} AS BIGINT) AS rows_per_band,
       CAST({pair_mod} AS BIGINT) AS pair_mod,
       CAST(n_true AS BIGINT) AS n_true_sampled,
       CAST(n_hit AS BIGINT) AS n_detected_of_sampled,
       CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall_sampled
FROM s
"""
    )


_STOCK_BALANCE_FLOOR_SQL = """
WITH daily AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END)
              AS BIGINT) AS net
  FROM lineitem WHERE l_suppkey <= 20
  GROUP BY 1, 2
), cum AS (
  SELECT l_suppkey, day, net,
         sum(net) OVER (PARTITION BY l_suppkey ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS s
  FROM daily
), cum2 AS (
  SELECT l_suppkey, day, net, s,
         min(s) OVER (PARTITION BY l_suppkey ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS m
  FROM cum
)
SELECT l_suppkey, strftime(day, '%Y-%m-%d') AS day, net,
       CAST(s - least(CAST(0 AS BIGINT), m) AS BIGINT) AS balance
FROM cum2
"""


_PURCHASE_SURVIVAL_KM_SQL = """
WITH per_user AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY 1
), obs AS (
  SELECT CASE WHEN fp IS NOT NULL
              THEN date_diff('day', CAST(first_ts AS DATE), CAST(fp AS DATE))
              ELSE date_diff('day', CAST(first_ts AS DATE),
                             CAST(last_ts AS DATE)) END AS t,
         CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), dist AS (
  SELECT t, sum(event) AS d, sum(1 - event) AS c FROM obs GROUP BY 1
), cum AS (
  SELECT t, d, c,
         sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumrm,
         sum(d + c) OVER () AS n
  FROM dist
), k AS (
  SELECT t, d, c, n - (cumrm - (d + c)) AS n_risk FROM cum
), l AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d > 0 AND d < n_risk
              THEN ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
              ELSE 0.0 END AS lnf,
         CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
  FROM k
), s AS (
  SELECT t, d, c, n_risk,
         sum(lnf) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cumln,
         sum(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cumz
  FROM l
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       CAST(c AS BIGINT) AS c,
       CASE WHEN cumz > 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(exp(cumln) * 1e6) AS BIGINT) END
         AS survival_micro
FROM s WHERE d > 0
"""


_AB_LOGRANK_TEST_SQL = """
WITH per_user AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY 1
), obs AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS is_a,
         CASE WHEN fp IS NOT NULL
              THEN date_diff('day', CAST(first_ts AS DATE), CAST(fp AS DATE))
              ELSE date_diff('day', CAST(first_ts AS DATE),
                             CAST(last_ts AS DATE)) END AS t,
         CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), dist AS (
  SELECT t, sum(event * is_a) AS d_a, sum(event) AS d,
         sum(is_a) AS rm_a, count(*) AS rm
  FROM obs GROUP BY 1
), cum AS (
  SELECT t, d_a, d, rm_a, rm,
         sum(rm_a) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ca,
         sum(rm) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS c,
         sum(rm_a) OVER () AS na, sum(rm) OVER () AS n_tot
  FROM dist
), k AS (
  SELECT t, d_a, d,
         na - (ca - rm_a) AS n_a,
         n_tot - (c - rm) AS n
  FROM cum WHERE d > 0 AND n_tot - (c - rm) > 1
), s AS (
  SELECT CAST(sum(d_a) AS BIGINT) AS o_a,
         sum(CAST(d AS DOUBLE)
             * (CAST(n_a AS DOUBLE) / CAST(n AS DOUBLE))) AS e,
         sum(CAST(d AS DOUBLE)
             * (CAST(n_a AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0 - CAST(n_a AS DOUBLE) / CAST(n AS DOUBLE))
             * CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)) AS v
  FROM k
)
SELECT o_a,
       CAST(round(e * 1e6) AS BIGINT) AS e_a_micro,
       CAST(round(v * 1e6) AS BIGINT) AS v_micro,
       CAST(round((CAST(o_a AS DOUBLE) - e) / sqrt(v) * 1e6) AS BIGINT)
         AS z_micro
FROM s
"""


def _revenue_bootstrap_ci_oracle() -> str:
    from etl_spark_spark.operators.stats import (
        LEHMER_M,
        POISSON1_THRESHOLDS,
        lehmer_multipliers,
    )

    w_case = "CASE " + " ".join(
        f"WHEN uu < {t} THEN {k}"
        for k, t in enumerate(POISSON1_THRESHOLDS)
    ) + f" ELSE {len(POISSON1_THRESHOLDS)} END"
    mults = ", ".join(
        f"({r}, {m})" for r, m in enumerate(lehmer_multipliers(100))
    )
    return f"""
WITH d AS (
  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), seeded AS (
  SELECT v,
         ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
           % {LEHMER_M - 1} + 1 AS s
  FROM d
), u AS (
  SELECT m.r AS r, v, (s * m.m) % {LEHMER_M} AS uu
  FROM seeded CROSS JOIN (VALUES {mults}) AS m(r, m)
), wts AS (
  SELECT r, v, {w_case} AS w FROM u
), per AS (
  SELECT r, CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean
  FROM wts GROUP BY r
), ranked AS (
  SELECT mean, row_number() OVER (ORDER BY mean, r) AS rn FROM per
), ci AS (
  SELECT min(CASE WHEN rn = 3 THEN mean END) AS ci_lo,
         min(CASE WHEN rn = 98 THEN mean END) AS ci_hi
  FROM ranked
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_value
  FROM d
)
SELECT t.n, CAST(100 AS INTEGER) AS b_replicates, t.mean_value,
       ci.ci_lo, ci.ci_hi
FROM t, ci
"""


_TRIMMED_MEAN_PRICE_SQL = """
WITH vals AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
), dist AS (
  SELECT v, count(*) AS c FROM vals GROUP BY 1
), cum AS (
  SELECT v, c,
         sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cumc,
         sum(c) OVER () AS n, sum(c * v) OVER () AS s
  FROM dist
), eff AS (
  SELECT n, s,
         greatest(0, least(c, CAST(floor(n / 10) AS BIGINT)
                              - (cumc - c))) * v AS lowv,
         greatest(0, least(c, CAST(floor(n / 10) AS BIGINT)
                              - (n - cumc))) * v AS highv
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(n / 10) AS BIGINT) AS k_trimmed_each_side,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
       CAST(s - sum(lowv) - sum(highv) AS DOUBLE)
         / CAST(n - 2 * CAST(floor(n / 10) AS BIGINT) AS DOUBLE)
         AS trimmed_mean_cents
FROM eff GROUP BY n, s
"""

_DOC_GOPHER_FILTER_SQL = rf"""
WITH base AS (
    SELECT doc_id, source,
           CAST(len({_TOKS}) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(lower(trim(text)), '\s', '', 'g'))
                AS BIGINT) AS word_chars,
           CAST(len(list_filter({_TOKS}, w -> regexp_matches(w, '[a-z]')))
                AS BIGINT) AS alpha_words,
           CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
               AS symbols,
           CAST(len(regexp_extract_all(lower(trim(text)), '{_EN_PAT}'))
                AS BIGINT) AS n_stop
    FROM documents
), flagged AS (
    SELECT *,
           (n_words >= 50 AND n_words <= 100000) AS r_word_count,
           (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
               AS r_word_len,
           (5 * alpha_words >= 4 * n_words) AS r_alpha,
           (10 * symbols <= n_words) AS r_symbol,
           (n_stop >= 2) AS r_stop
    FROM base
)
SELECT doc_id, source, n_words, word_chars, alpha_words, symbols, n_stop,
       r_word_count, r_word_len, r_alpha, r_symbol, r_stop,
       (r_word_count AND r_word_len AND r_alpha AND r_symbol AND r_stop)
           AS keep
FROM flagged
"""


def _fd_branch_sql(tab: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{tab}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (__k > 1) AS BIGINT) AS n_violating,
       count(*) FILTER (__k > 1) = 0 AS holds
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS __k FROM {tab} GROUP BY 1)
"""


_FD_AUDIT_SQL = " UNION ALL ".join(
    _fd_branch_sql(t, l, r)
    for t, l, r in [
        ("part", "p_brand", "p_type"),
        ("part", "p_name", "p_brand"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("customer", "c_name", "c_nationkey"),
        ("nation", "n_nationkey", "n_regionkey"),
        ("nation", "n_regionkey", "n_nationkey"),
    ]
)

_DOC_LENGTH_HISTOGRAM_SQL = rf"""
WITH base AS (
    SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n FROM documents
)
SELECT source,
       CAST(length(bin(n)) - 1 AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n) AS min_tokens,
       max(n) AS max_tokens,
       CAST(sum(n) AS BIGINT) AS sum_tokens
FROM base
GROUP BY 1, 2
"""

_SOURCE_OVERLAP_SQL = rf"""
WITH toks AS (SELECT source, {_TOKS} AS t FROM documents),
sh0 AS (
    SELECT source,
           unnest(CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE []::VARCHAR[] END) AS s
    FROM toks
),
sh AS (SELECT DISTINCT source, s FROM sh0),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM sh a JOIN sh b USING (s)
    WHERE a.source < b.source
    GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared, na.n AS n_a, nb.n AS n_b
FROM pairs
JOIN sizes na ON pairs.source_a = na.source
JOIN sizes nb ON pairs.source_b = nb.source
"""


def oracle_sql() -> dict[str, str]:
    return {
        "superdesconto": _SUPERDESCONTO_SQL,
        "allocation": _ALLOCATION_SQL,
        "pricing_summary": _PRICING_SUMMARY_SQL,
        "dedup_latest_part": _DEDUP_LATEST_SQL,
        "top_orders_per_customer": _TOP_ORDERS_SQL,
        "customers_without_orders": _CUSTOMERS_WITHOUT_ORDERS_SQL,
        "orders_enriched": _ORDERS_ENRICHED_SQL,
        "normalize_keys": _NORMALIZE_KEYS_SQL,
        "monthly_orders_1995": _MONTHLY_ORDERS_SQL,
        "events_by_type": _EVENTS_BY_TYPE_SQL,
        "doc_text_stats": _DOC_TEXT_STATS_SQL,
        "doc_lang_id": _DOC_LANG_ID_SQL,
        "doc_exact_dedup": _DOC_EXACT_DEDUP_SQL,
        "neardup_minhash": _NEARDUP_MINHASH_SQL,
        "neardup_bucket_cap": _NEARDUP_BUCKET_CAP_SQL,
        "doc_incremental_dedup": _DOC_INCREMENTAL_DEDUP_SQL,
        "doc_chunks": _DOC_CHUNKS_SQL,
        "small_qty_revenue": _SMALL_QTY_REVENUE_SQL,
        "emb_label_centroids": _EMB_LABEL_CENTROIDS_SQL,
        "price_histogram": _PRICE_HISTOGRAM_SQL,
        "event_funnel": _EVENT_FUNNEL_SQL,
        "user_retention_cohorts": _USER_RETENTION_COHORTS_SQL,
        "doc_weighted_sample": _DOC_WEIGHTED_SAMPLE_SQL,
        "neardup_ngram_jaccard": _NEARDUP_NGRAM_SQL,
        "neardup_prefix_jaccard": _NEARDUP_PREFIX_SQL,
        "doc_simhash": _DOC_SIMHASH_SQL,
        "emb_cosine_topk": _EMB_COSINE_SQL,
        "events_tumbling": _EVENTS_TUMBLING_SQL,
        "events_time_rollup": _EVENTS_TIME_ROLLUP_SQL,
        "events_sessionize": _EVENTS_SESSIONIZE_SQL,
        "custkeys_both_years": _CUSTKEYS_BOTH_SQL,
        "custkeys_only_1995": _CUSTKEYS_ONLY_1995_SQL,
        "rollup_losses": _ROLLUP_LOSSES_SQL,
        "supplier_share_expr": _SUPPLIER_SHARE_EXPR_SQL,
        "events_props_map": _EVENTS_PROPS_MAP_SQL,
        "events_sliding": _EVENTS_SLIDING_SQL,
        "emb_near_dup": _EMB_NEAR_DUP_SQL,
        "semantic_dedup": _SEMANTIC_DEDUP_SQL,
        "global_top_orders": _GLOBAL_TOP_ORDERS_SQL,
        "doc_fingerprints": _DOC_FINGERPRINTS_SQL,
        "shipping_priority": _SHIPPING_PRIORITY_SQL,
        "local_supplier_volume": _LOCAL_SUPPLIER_SQL,
        "dedup_any_count": _DEDUP_ANY_COUNT_SQL,
        "nation_reconcile": _NATION_RECONCILE_SQL,
        "sql_frontend": _SQL_FRONTEND_SQL,
        "orders_profile": _ORDERS_PROFILE_SQL,
        "above_avg_orders": _ABOVE_AVG_ORDERS_SQL,
        "emb_stats": _EMB_STATS_SQL,
        "price_quantiles": _PRICE_QUANTILES_SQL,
        "purchase_last_click": _PURCHASE_LAST_CLICK_SQL,
        "neardup_simhash": _NEARDUP_SIMHASH_SQL,
        "neardup_simhash_exact": _NEARDUP_SIMHASH_EXACT_SQL,
        "error_context_views": _ERROR_CONTEXT_SQL,
        "multimodal_features": _MULTIMODAL_FEATURES_SQL,
        "user_value_trend": _USER_VALUE_TREND_SQL,
        "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
        "doc_split_counts": _DOC_SPLIT_COUNTS_SQL,
        "doc_stratified_sample": _DOC_STRATIFIED_SAMPLE_SQL,
        "doc_group_split": _DOC_GROUP_SPLIT_SQL,
        "doc_repetition": _DOC_REPETITION_SQL,
        "doc_pii_scrub": _DOC_PII_SCRUB_SQL,
        "data_quality": _DATA_QUALITY_SQL,
        "source_mix_sample": _SOURCE_MIX_SAMPLE_SQL,
        "doc_shuffle_order": _DOC_SHUFFLE_ORDER_SQL,
        "fuzzy_code_match": _FUZZY_CODE_MATCH_SQL,
        "returns_grouping_sets": _RETURNS_GROUPING_SETS_SQL,
        "market_share": _MARKET_SHARE_SQL,
        "doc_source_cap": _DOC_SOURCE_CAP_SQL,
        "vocab_topk": _VOCAB_TOPK_SQL,
        "doc_decontaminate": _DOC_DECONTAMINATE_SQL,
        "doc_pack": _DOC_PACK_SQL,
        "doc_top_terms": _DOC_TOP_TERMS_SQL,
        "customer_spend_deciles": _CUSTOMER_SPEND_DECILES_SQL,
        "neardup_clusters": _NEARDUP_CLUSTERS_SQL,
        "doc_curation": _DOC_CURATION_SQL,
        "doc_curation_capped": _DOC_CURATION_CAPPED_SQL,
        "doc_training_prep": _DOC_TRAINING_PREP_SQL,
        "customer_order_gaps": _CUSTOMER_ORDER_GAPS_SQL,
        "customer_year_arrays": _CUSTOMER_YEAR_ARRAYS_SQL,
        "order_priority_counts": _ORDER_PRIORITY_COUNTS_SQL,
        "min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
        "volume_shipping": _VOLUME_SHIPPING_SQL,
        "product_profit": _PRODUCT_PROFIT_SQL,
        "returned_top_customers": _RETURNED_TOP_CUSTOMERS_SQL,
        "important_parts": _IMPORTANT_PARTS_SQL,
        "custdist": _CUSTDIST_SQL,
        "promo_revenue": _PROMO_REVENUE_SQL,
        "top_supplier": _TOP_SUPPLIER_SQL,
        "large_orders": _LARGE_ORDERS_SQL,
        "part_promotion_suppliers": _PART_PROMOTION_SUPPLIERS_SQL,
        "orders_pit_dimension": _ORDERS_PIT_DIMENSION_SQL,
        "doc_length_winsor": _DOC_LENGTH_WINSOR_SQL,
        "merge_upsert": _MERGE_UPSERT_SQL,
        "cast_decimal_policy": _CAST_DECIMAL_POLICY_SQL,
        # compaction is lossless by contract: same MERGE expansion
        "compacted_snapshot": _MERGE_UPSERT_SQL,
        "production_daily_loop": _PRODUCTION_DAILY_LOOP_SQL,
        "indexed_zorder_scan": _INDEXED_ZORDER_SCAN_SQL,
        "events_forward_fill": _EVENTS_FORWARD_FILL_SQL,
        "split_leakage": _SPLIT_LEAKAGE_SQL,
        "trade_pagerank": _TRADE_PAGERANK_SQL,
        "supplier_co_purchase": _SUPPLIER_CO_PURCHASE_SQL,
        "supplier_triangles": _SUPPLIER_TRIANGLES_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "user_activity_streaks": _USER_ACTIVITY_STREAKS_SQL,
        "ab_test_welch": _AB_TEST_WELCH_SQL,
        "lang_id_eval": _LANG_ID_EVAL_SQL,
        "multi_touch_attribution": _MULTI_TOUCH_ATTRIBUTION_SQL,
        "pareto_parts": _PARETO_PARTS_SQL,
        "inverted_index": _INVERTED_INDEX_SQL,
        "benford_totalprice": _BENFORD_TOTALPRICE_SQL,
        "exact_price_quartiles": _EXACT_PRICE_QUARTILES_SQL,
        "ks_test_ab": _KS_TEST_AB_SQL,
        "events_props_variant": _EVENTS_PROPS_VARIANT_SQL,
        "pyds_source_stats": _PYDS_SOURCE_STATS_SQL,
        "time_weighted_value": _TIME_WEIGHTED_VALUE_SQL,
        "monthly_revenue_mom": _MONTHLY_REVENUE_MOM_SQL,
        "abc_classification": _ABC_CLASSIFICATION_SQL,
        "conversion_latency": _CONVERSION_LATENCY_SQL,
        "part_cooccurrence_cosine": _PART_COOCCURRENCE_COSINE_SQL,
        "chi2_type_variant": _CHI2_TYPE_VARIANT_SQL,
        "customer_spend_gini": _CUSTOMER_SPEND_GINI_SQL,
        "concurrent_sessions": _CONCURRENT_SESSIONS_SQL,
        "global_spend_rank": _GLOBAL_SPEND_RANK_SQL,
        "replica_drift_audit": _REPLICA_DRIFT_AUDIT_SQL,
        "customer_order_docs": _CUSTOMER_ORDER_DOCS_SQL,
        "doc_budget_mix": _DOC_BUDGET_MIX_SQL,
        "forecast_revenue": _FORECAST_REVENUE_SQL,
        "revenue_cube": _REVENUE_CUBE_SQL,
        "priority_return_pivot": _PRIORITY_RETURN_PIVOT_SQL,
        "corr_exact": _CORR_EXACT_SQL,
        # Approximate/sketch/model queries emit derived checks (exact
        # counts + invariant booleans) so even they get hard verdicts.
        "emb_cosine_topk_lsh": _ANN_TOPK_CHECK_SQL,
        "emb_cosine_topk_ivf": _ANN_TOPK_CHECK_SQL,
        "emb_cosine_topk_ivfpq": _ANN_TOPK_CHECK_SQL,
        "emb_near_dup_lsh": _EMB_NEAR_DUP_LSH_SQL,
        "sketch_stats": _SKETCH_STATS_SQL,
        "doc_quality_model": _DOC_QUALITY_MODEL_SQL,
        "disjunctive_revenue": _DISJUNCTIVE_REVENUE_SQL,
        "exclusive_supplier_orders": _EXCLUSIVE_SUPPLIER_ORDERS_SQL,
        "part_supplier_counts": _PART_SUPPLIER_COUNTS_SQL,
        "rich_idle_customers": _RICH_IDLE_CUSTOMERS_SQL,
        "user_rolling_value": _USER_ROLLING_VALUE_SQL,
        "session_paths": _SESSION_PATHS_SQL,
        "returns_unpivot": _RETURNS_UNPIVOT_SQL,
        "sketch_rollup": _SKETCH_ROLLUP_SQL,
        "doc_bigram_novelty": _DOC_BIGRAM_NOVELTY_SQL,
        "scd2_customer_history": _SCD2_CUSTOMER_HISTORY_SQL,
        "doc_group_sample": _DOC_GROUP_SAMPLE_SQL,
        "daily_dense_orders": _DAILY_DENSE_ORDERS_SQL,
        "price_outliers": _PRICE_OUTLIERS_SQL,
        "bm25_search": _bm25_oracle(),
        "doc_surprisal": _surprisal_oracle(),
        "doc_bigram_surprisal": _bigram_surprisal_oracle(),
        "doc_dsir_weights": _dsir_weights_oracle(),
        "emb_covariance": _emb_covariance_oracle(),
        "emb_covariance_blocked": _emb_covariance_oracle(),
        "doc_epoch_shuffle": """
SELECT CAST(row_number() OVER (
           ORDER BY md5('0#' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS position,
       doc_id, source
FROM documents
""",
        "ks_drift_by_type": """
WITH d AS (
  SELECT event_type,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), dist AS (
  SELECT event_type, cents,
         count(*) FILTER (variant = 'A') AS ca,
         count(*) FILTER (variant <> 'A') AS cb
  FROM d GROUP BY 1, 2
), cum AS (
  SELECT event_type, cents,
         sum(ca) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cuma,
         sum(cb) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumb,
         sum(ca) OVER (PARTITION BY event_type) AS na,
         sum(cb) OVER (PARTITION BY event_type) AS nb
  FROM dist
)
SELECT event_type,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))) AS d_stat
FROM cum GROUP BY 1
HAVING max(na) > 0 AND max(nb) > 0
""",
        "join_mv_retractions": """
WITH corrected AS (
  SELECT o_orderkey AS orderkey, o_custkey,
         CASE WHEN o_custkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-03-01'
)
SELECT l.l_orderkey AS orderkey, l.l_linenumber, c.o_custkey,
       c.o_orderstatus,
       CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents,
       CAST(count(*) AS BIGINT) AS mult
FROM lineitem l JOIN corrected c ON l.l_orderkey = c.orderkey
GROUP BY 1, 2, 3, 4, 5
""",
        "incremental_join_mv": """
SELECT l_orderkey AS orderkey, l_linenumber, l_suppkey,
       o_custkey, o_orderstatus,
       CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-03-01'
""",
        "join_mv_temporal": """
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, view_id, purchase_id,
       strftime(view_ts, '%Y-%m-%d %H:%M:%S') AS view_time,
       strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
       CAST(round(purchase_value * 100) AS BIGINT) AS purchase_cents
FROM v JOIN p ON p.user_id = v.user_id
WHERE abs(epoch_us(view_ts) // 1000000
          - epoch_us(purchase_ts) // 1000000) <= 3600
""",
        "text_formats_roundtrip": """
SELECT c_mktsegment, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY 1, 2
""",
        "doc_training_mix": """
WITH c AS (
  SELECT source, lang, source || '|' || lang AS stratum,
         count(*) AS n_docs
  FROM documents GROUP BY source, lang
),
tot AS (SELECT sum(n_docs) AS w FROM c),
fl AS (
  SELECT source, lang, stratum, n_docs,
         (300 * n_docs) // w AS flr,
         (300 * n_docs) % w AS rem
  FROM c, tot
),
lo AS (SELECT 300 - sum(flr) AS leftover FROM fl),
alloc AS (
  SELECT source, lang,
         flr + CASE WHEN row_number()
                        OVER (ORDER BY rem DESC, stratum)
                    <= (SELECT leftover FROM lo)
               THEN 1 ELSE 0 END AS alloc
  FROM fl
),
ranked AS (
  SELECT d.doc_id, d.source, d.lang,
         row_number() OVER (
             PARTITION BY d.source, d.lang
             ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rn
  FROM documents d
),
picked AS (
  SELECT r.doc_id, r.source, r.lang
  FROM ranked r JOIN alloc a USING (source, lang)
  WHERE r.rn <= a.alloc
)
SELECT CAST(row_number() OVER (
           ORDER BY md5('0#' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS position,
       doc_id, source, lang
FROM picked
""",
        "emb_hard_negatives": _EMB_HARD_NEGATIVES_SQL,
        "emb_label_outliers": _EMB_LABEL_OUTLIERS_SQL,
        "cluster_canonicalize": _CLUSTER_CANONICALIZE_SQL,
        "duplicate_spans": _DUPLICATE_SPANS_SQL,
        "mann_whitney_ab": _MANN_WHITNEY_AB_SQL,
        "supplier_reach_bfs": _SUPPLIER_REACH_BFS_SQL,
        "column_entropy": _COLUMN_ENTROPY_SQL,
        "priority_lines_by_status": _PRIORITY_LINES_BY_STATUS_SQL,
        "waiting_suppliers": _WAITING_SUPPLIERS_SQL,
        "mv_routed_revenue": _MV_ROUTED_REVENUE_SQL,
        "cumulative_new_customers": _CUMULATIVE_NEW_CUSTOMERS_SQL,
        "order_value_position": _ORDER_VALUE_POSITION_SQL,
        "media_phash_pairs": _MEDIA_PHASH_PAIRS_SQL,
        "phrase_search": _phrase_search_oracle(),
        "weighted_price_quartiles": _WEIGHTED_PRICE_QUARTILES_SQL,
        "dau_mau_stickiness": _DAU_MAU_STICKINESS_SQL,
        "revenue_autocorr": _REVENUE_AUTOCORR_SQL,
        "knn_label_accuracy": _KNN_LABEL_ACCURACY_SQL,
        "revenue_changepoint": _REVENUE_CHANGEPOINT_SQL,
        "bpe_merges": _bpe_merges_oracle(),
        "bpe_token_counts": _bpe_token_counts_oracle(),
        "doc_containment": _DOC_CONTAINMENT_SQL_TMPL.format(
            shingles=_SHINGLES, mh=_MH_COLS, bands=_BANDS_SQL
        ),
        "basket_rules": _BASKET_RULES_SQL,
        "term_pmi": _TERM_PMI_SQL,
        "neardup_eval": _neardup_eval_tuned_sql(),
        "neardup_recall_sampled": _neardup_recall_sampled_sql(),
        "stock_balance_floor": _STOCK_BALANCE_FLOOR_SQL,
        "purchase_survival_km": _PURCHASE_SURVIVAL_KM_SQL,
        "ab_logrank_test": _AB_LOGRANK_TEST_SQL,
        "revenue_bootstrap_ci": _revenue_bootstrap_ci_oracle(),
        "trimmed_mean_price": _TRIMMED_MEAN_PRICE_SQL,
        "doc_gopher_filter": _DOC_GOPHER_FILTER_SQL,
        "fd_audit": _FD_AUDIT_SQL,
        "doc_length_histogram": _DOC_LENGTH_HISTOGRAM_SQL,
        "source_overlap": _SOURCE_OVERLAP_SQL,
    }
