"""text queries split out of __spark_entry__.py (round 9) — see that module's docstring for the driver contract. Mechanically moved, text verbatim."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark_spark.functions.money import money_sum, money_sum_sql
from etl_spark_spark.operators.stats import checked_measure_sql
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



def q_doc_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate privacy audit, the quasi-identifier complement to
    q_doc_pii_scrub's direct-identifier redaction: k-anonymity of the
    corpus metadata (source, lang, 200-char length band) at k=5,
    reported BEFORE suppression and AFTER suppressing unsafe classes
    — the after row's n_unsafe_classes = 0 / min_class_size >= 5 is
    the standing proof that suppression yields k-anonymity by
    construction, and its n_exposed_rows prices the rows the release
    gives up (operators/privacy.py). One hash aggregate to the
    equivalence classes; suppression is a class-key anti-join."""
    from etl_spark_spark.operators.privacy import (
        anonymity_classes,
        k_anonymity_summary,
        suppress_unsafe_classes,
    )

    docs = table(
        spark, sf_dir, "documents", columns=["doc_id", "source", "lang", "n_chars"]
    ).withColumn("len_band", F.expr("n_chars div 200"))
    quasi = ["source", "lang", "len_band"]
    before = k_anonymity_summary(anonymity_classes(docs, quasi), k=5)
    released = suppress_unsafe_classes(docs, quasi, k=5)
    after = k_anonymity_summary(anonymity_classes(released, quasi), k=5)
    return before.select(
        F.lit("before").alias("stage"), "*"
    ).unionByName(after.select(F.lit("after").alias("stage"), "*"))


_DOC_K_ANONYMITY_SQL = """
WITH d AS (
  SELECT doc_id, source, lang, n_chars // 200 AS len_band
  FROM documents
), cls AS (
  SELECT source, lang, len_band, count(*) AS class_size
  FROM d GROUP BY 1, 2, 3
), rel AS (
  SELECT d.* FROM d
  JOIN cls c ON c.source IS NOT DISTINCT FROM d.source
            AND c.lang IS NOT DISTINCT FROM d.lang
            AND c.len_band IS NOT DISTINCT FROM d.len_band
  WHERE c.class_size >= 5
), cls_after AS (
  SELECT source, lang, len_band, count(*) AS class_size
  FROM rel GROUP BY 1, 2, 3
)
SELECT 'before' AS stage,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unsafe_classes,
       CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
            AS BIGINT) AS n_exposed_rows,
       min(class_size) AS min_class_size
FROM cls
UNION ALL
SELECT 'after',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
            AS BIGINT),
       min(class_size)
FROM cls_after
"""


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



def q_doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_doc_decontaminate through the Bloom-prefilter scale path: the
    eval shingle set becomes a 2^20-bit bitmap and only bloom-surviving
    corpus shingles reach the exact join — the plan for when the eval
    side is too big to broadcast (multi-benchmark suites). Bloom
    filters cannot miss a member, so this is bit-identical to the
    unfiltered operator; the oracle IS the exact decontamination SQL,
    making the losslessness a standing value-hash proof."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    pairs = shingle_set(toks, "doc_id", word_shingles("t", 3))
    is_eval = hash_bucket("doc_id", 1) == "f"
    scored = contamination_scores(
        pairs.filter(~is_eval),
        pairs.filter(is_eval),
        "doc_id",
        bloom_bits=1 << 20,
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



def q_doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped LM scoring, one context order up from
    doc_surprisal: mean add-1-smoothed BIGRAM surprisal per document
    under corpus statistics — word-salad scores high even when its
    unigram mix looks normal; templated text scores low. Milli-nat
    integer output (operators/lm.py:bigram_surprisal)."""
    from etl_spark_spark.operators.lm import bigram_surprisal

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_surprisal(docs, "doc_id", "text")


_BLOOM_M = 1 << 22  # 4M bits = 66k words; ~0 FP up to ~500k history keys
_BLOOM_K = 5


def q_bloom_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dedup via a Bloom filter — the O(batch) answer to
    "is this new document already in the 100 TB history?" that the
    per-batch anti-join (O(history) shuffle every time) cannot give.
    History = even doc_ids, new batch = odd; key = content fingerprint
    (md5 of normalized text). Emits per new doc the bloom verdict, the
    exact membership (for false-positive accounting), and the
    false_positive flag; false NEGATIVES are structurally impossible
    (the unit suite pins that on planted collisions). Everything
    md5-derived, so the oracle rebuilds the identical bitmap
    (operators/bloom.py)."""
    from etl_spark_spark.operators.bloom import bloom_build, bloom_probe

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    key = F.md5(F.lower(F.trim(F.col("text"))))
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).withColumn("__k", key)
    bloom = bloom_build(
        hist.select(key.alias("k")), "k", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    probed = bloom_probe(
        new, bloom, F.col("__k"), m_bits=_BLOOM_M, k=_BLOOM_K
    )
    hist_keys = hist.select(key.alias("__hk")).distinct()
    return (
        probed.join(
            hist_keys, probed["__k"] == hist_keys["__hk"], "left"
        )
        .select(
            "doc_id",
            "bloom_hit",
            F.col("__hk").isNotNull().alias("exact_dup"),
            (F.col("bloom_hit") & F.col("__hk").isNull()).alias(
                "false_positive"
            ),
        )
    )


_CMS_W, _CMS_D, _CMS_TOPK = 1024, 3, 50


def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimates — constant state per
    group vs the vocabulary-size exact aggregate. Builds one sketch PER
    SOURCE, merges them cell-wise into the corpus sketch (the operation
    that makes CMS deployable: per-day/per-shard sketches fold), then
    point-estimates the top-50 exact terms and emits est vs exact. The
    oracle builds the corpus grid DIRECTLY, so the value-hash match is
    a standing proof that merged-per-group == one-shot (sums are
    associative). overcount >= 0 is the CMS guarantee; its magnitude
    is the eps*N collision term (operators/sketches.py)."""
    from etl_spark_spark.operators.sketches import cms_build, cms_estimate

    docs = table(
        spark, sf_dir, "documents", columns=["doc_id", "text", "source"]
    )
    occ = docs.select(
        "source", F.explode(tokens("text")).alias("term")
    )
    per_source = cms_build(
        occ, "term", width=_CMS_W, depth=_CMS_D, group_cols=["source"]
    )
    merged = per_source.groupBy("row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    exact = occ.groupBy("term").agg(F.count("*").alias("exact_n"))
    probes = exact.orderBy(
        F.col("exact_n").desc(), F.col("term")
    ).limit(_CMS_TOPK)
    est = cms_estimate(
        merged, probes.select("term"), "term", width=_CMS_W, depth=_CMS_D
    )
    return est.join(exact, "term").select(
        "term",
        "exact_n",
        "est",
        (F.col("est") - F.col("exact_n")).alias("overcount"),
    )


def _cms_term_counts_oracle() -> str:
    from etl_spark_spark.operators.sketches import cms_build_sql_cte

    ctes = cms_build_sql_cte(
        "SELECT term FROM "
        "(SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) "
        "AS term FROM documents)",
        _CMS_W,
        _CMS_D,
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT term, {r} AS row, "
        f"('0x' || substr(md5('cms{r}~' || term), 1, 15))::BIGINT "
        f"% {_CMS_W} AS bucket FROM probes"
        for r in range(_CMS_D)
    )
    return f"""
WITH {ctes},
exact AS (
  SELECT term, count(*) AS exact_n FROM occ_cms GROUP BY 1
), probes AS (
  SELECT term FROM exact ORDER BY exact_n DESC, term LIMIT {_CMS_TOPK}
), pc AS ({probe_cells}),
est AS (
  SELECT p.term, min(coalesce(c.cnt, 0)) AS est
  FROM pc p LEFT JOIN cms c USING (row, bucket)
  GROUP BY 1
)
SELECT e.term, x.exact_n, e.est, e.est - x.exact_n AS overcount
FROM est e JOIN exact x USING (term)
"""


def q_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog distinct-token counts per source + the
    cell-wise MERGE of all 20 per-source sketches as an 'ALL' row —
    unlike approx_count_distinct's opaque engine sketch (q_sketch_stats
    can only derived-check it), every register and the final estimate
    here are bit-identical cross-engine, so the oracle hash-matches
    the ESTIMATES themselves. est_milli lands within ~2%/sqrt-band of
    exact_distinct (visible in the output); merge(max per bucket) ==
    one-shot is what the ALL row proves on real data
    (operators/sketches.py:hll_cells/hll_estimate)."""
    from etl_spark_spark.operators.sketches import hll_cells, hll_estimate

    docs = table(spark, sf_dir, "documents", columns=["text", "source"])
    # 3-gram shingles, not unigrams: the synthetic corpus has a ~31
    # word vocabulary (degenerate for a 1024-register sketch) but tens
    # of thousands of distinct shingles — exercises the raw-estimate
    # branch per source AND the merged row
    toks = docs.select("source", tokens("text").alias("t"))
    occ = toks.select(
        "source", F.explode(word_shingles("t", 3)).alias("term")
    )
    cells = hll_cells(occ, "term", group_cols=["source"])
    return _hll_assemble(occ, cells)


def _hll_assemble(occ, cells) -> DataFrame:
    """Shared tail of the HLL queries: per-source estimates + the
    max-merged ALL row, joined to exact distinct counts."""
    from etl_spark_spark.operators.sketches import hll_estimate

    per_source = hll_estimate(cells, group_cols=["source"])
    merged = cells.groupBy("bucket").agg(
        F.max("m_rank").alias("m_rank")
    ).withColumn("source", F.lit("ALL"))
    all_row = hll_estimate(merged, group_cols=["source"])
    exact = occ.groupBy("source").agg(
        F.count_distinct("term").alias("exact_distinct")
    ).unionByName(
        occ.agg(F.count_distinct("term").alias("exact_distinct"))
        .withColumn("source", F.lit("ALL"))
    )
    return (
        per_source.unionByName(all_row)
        .join(exact, "source")
        .select("source", "n_buckets_used", "est_milli", "exact_distinct")
    )


def q_hll_stream_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sketch maintenance: the corpus arrives as three
    id-ordered batches and the HLL register table is FOLDED per batch
    (max-merge into the running state, checkpointed between folds —
    the pattern a foreachBatch maintenance job runs, same discipline
    as q_doc_incremental_dedup). The oracle is the ONE-SHOT sketch SQL
    (identical to q_hll_distinct_tokens), so the value-hash match is a
    standing proof that per-batch register folding loses nothing —
    what makes HLL deployable as continuously-maintained state."""
    from etl_spark_spark.operators.sketches import hll_cells

    docs = table(
        spark, sf_dir, "documents", columns=["doc_id", "text", "source"]
    )
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    bounds = [(0, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi + 1)]
    state = None
    for lo, up in bounds:
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
        ).select("source", tokens("text").alias("t"))
        occ_b = batch.select(
            "source", F.explode(word_shingles("t", 3)).alias("term")
        )
        cells_b = hll_cells(occ_b, "term", group_cols=["source"])
        if state is None:
            state = cells_b
        else:
            state = (
                state.unionByName(cells_b)
                .groupBy("source", "bucket")
                .agg(F.max("m_rank").alias("m_rank"))
            )
        state = state.localCheckpoint(eager=True)
    toks = docs.select("source", tokens("text").alias("t"))
    occ = toks.select(
        "source", F.explode(word_shingles("t", 3)).alias("term")
    )
    return _hll_assemble(occ, state)


def q_hll_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH SET ALGEBRA: pairwise distinct-shingle overlap between
    every source pair estimated purely from the 20 per-source HLL
    sketches — union by register max-merge, intersection by
    inclusion-exclusion (est_a + est_b - est_union, exact long
    arithmetic on the milli estimates). This is why HLL beats exact
    distinct at 100 TB: all 190 pairwise overlaps come from 20 KB of
    registers with no second corpus scan; the exact_inter reference
    column (one term self-join) shows the error live — including the
    textbook caveat that inclusion-exclusion error scales with the
    UNION size (sigma ~3% of |A∪B|), so small overlaps of big sets
    are noisy (sf0.01: |union| ~2.5k -> +-~75 absolute). Registers and
    estimates hash-exact cross-engine (operators/sketches.py)."""
    from etl_spark_spark.operators.sketches import hll_cells, hll_estimate

    docs = table(spark, sf_dir, "documents", columns=["text", "source"])
    toks = docs.select("source", tokens("text").alias("t"))
    occ = toks.select(
        "source", F.explode(word_shingles("t", 3)).alias("term")
    )
    cells = hll_cells(occ, "term", group_cols=["source"]).localCheckpoint(
        eager=True
    )
    per_source = hll_estimate(cells, group_cols=["source"])
    srcs = cells.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(srcs.select(F.col("source").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    ca = pairs.join(cells, F.col("source") == F.col("src_a")).select(
        "src_a", "src_b", "bucket", "m_rank"
    )
    cb = pairs.join(cells, F.col("source") == F.col("src_b")).select(
        "src_a", "src_b", "bucket", "m_rank"
    )
    u = ca.unionByName(cb).groupBy("src_a", "src_b", "bucket").agg(
        F.max("m_rank").alias("m_rank")
    )
    est_union = hll_estimate(u, group_cols=["src_a", "src_b"]).select(
        "src_a", "src_b", F.col("est_milli").alias("est_union_milli")
    )
    ea = per_source.select(
        F.col("source").alias("src_a"), F.col("est_milli").alias("est_a_milli")
    )
    eb = per_source.select(
        F.col("source").alias("src_b"), F.col("est_milli").alias("est_b_milli")
    )
    terms = occ.distinct()
    ta = terms.select(F.col("source").alias("src_a"), "term")
    tb = terms.select(F.col("source").alias("src_b"), "term")
    exact = (
        ta.join(tb, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    return (
        est_union.join(ea, "src_a")
        .join(eb, "src_b")
        .join(exact, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            (
                F.col("est_a_milli")
                + F.col("est_b_milli")
                - F.col("est_union_milli")
            ).alias("est_inter_milli"),
            "est_union_milli",
            F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
        )
    )


def _hll_source_overlap_oracle() -> str:
    from etl_spark_spark.operators.sketches import (
        hll_sql_estimate_exprs,
        hll_sql_rank_case,
    )

    e = hll_sql_estimate_exprs()
    rank = hll_sql_rank_case("(h60 // 1024)")
    est_union = e["est"]
    return f"""
WITH toks AS (
  SELECT source,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), occ AS (
  SELECT source, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS term
  FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), h AS (
  SELECT source,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h60
  FROM occ
), cells AS MATERIALIZED (
  SELECT source, h60 % 1024 AS bucket,
         max({rank}) AS m_rank
  FROM h GROUP BY 1, 2
), agg_s AS (
  SELECT source, count(*) AS n_buckets_used, {e['s']} AS s_scaled
  FROM cells GROUP BY 1
), est_s AS (
  SELECT source,
         CAST(round(({e['est']}) * 1000.0) AS BIGINT) AS est_milli
  FROM agg_s
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM cells) a,
       (SELECT DISTINCT source FROM cells) b
  WHERE a.source < b.source
), ucells AS (
  SELECT p.src_a, p.src_b, c.bucket, max(c.m_rank) AS m_rank
  FROM pairs p JOIN cells c
    ON c.source = p.src_a OR c.source = p.src_b
  GROUP BY 1, 2, 3
), agg_u AS (
  SELECT src_a, src_b, count(*) AS n_buckets_used, {e['s']} AS s_scaled
  FROM ucells GROUP BY 1, 2
), est_u AS (
  SELECT src_a, src_b,
         CAST(round(({est_union}) * 1000.0) AS BIGINT) AS est_union_milli
  FROM agg_u
), dterms AS (
  SELECT DISTINCT source, term FROM occ
), exact AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS exact_inter
  FROM dterms a JOIN dterms b
    ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT u.src_a, u.src_b,
       ea.est_milli + eb.est_milli - u.est_union_milli AS est_inter_milli,
       u.est_union_milli,
       coalesce(x.exact_inter, 0) AS exact_inter
FROM est_u u
JOIN est_s ea ON ea.source = u.src_a
JOIN est_s eb ON eb.source = u.src_b
LEFT JOIN exact x ON x.src_a = u.src_a AND x.src_b = u.src_b
"""


def _hll_distinct_oracle() -> str:
    from etl_spark_spark.operators.sketches import (
        hll_sql_estimate_exprs,
        hll_sql_rank_case,
    )

    e = hll_sql_estimate_exprs()
    rank = hll_sql_rank_case("(h60 // 1024)")
    return f"""
WITH toks AS (
  SELECT source,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), occ AS (
  SELECT source, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS term
  FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), h AS (
  SELECT source,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h60
  FROM occ
), cells AS (
  SELECT source, h60 % 1024 AS bucket,
         max({rank}) AS m_rank
  FROM h GROUP BY 1, 2
), allcells AS (
  SELECT 'ALL' AS source, bucket, max(m_rank) AS m_rank
  FROM cells GROUP BY 2
), united AS (
  SELECT * FROM cells UNION ALL SELECT * FROM allcells
), agg AS (
  SELECT source, count(*) AS n_buckets_used,
         {e['s']} AS s_scaled
  FROM united GROUP BY 1
), est AS (
  SELECT source, n_buckets_used,
         CAST(round(({e['est']}) * 1000.0) AS BIGINT) AS est_milli
  FROM agg
), exact AS (
  SELECT source, count(DISTINCT term) AS exact_distinct
  FROM occ GROUP BY 1
  UNION ALL
  SELECT 'ALL', count(DISTINCT term) FROM occ
)
SELECT e.source, e.n_buckets_used, e.est_milli, x.exact_distinct
FROM est e JOIN exact x USING (source)
"""


def q_doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's final output: every document bucketed head/middle/tail
    BY LANGUAGE on its Kneser-Ney surprisal (head = the third of each
    language's corpus the reference model finds most natural — what
    CCNet keeps for training). Tercile edges are exact integer
    ceilings over the per-language score distribution
    (operators/stats.py:integer_tercile_buckets) on top of
    q_doc_kn_perplexity's model; ties share buckets, reproducibly."""
    from etl_spark_spark.operators.lm import kn_bigram_surprisal
    from etl_spark_spark.operators.stats import integer_tercile_buckets

    docs = table(
        spark, sf_dir, "documents", columns=["doc_id", "text", "lang"]
    )
    train = docs.filter(F.col("lang") == F.lit("en")).select(
        "doc_id", "text"
    )
    kn = kn_bigram_surprisal(
        docs.select("doc_id", "text"), train, "doc_id", "text"
    )
    scored = kn.select("doc_id", "kn_surprisal_milli").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    # the tercile operator references `scored` twice (distribution +
    # final join); at replica scale AQE loses the exchange reuse and
    # the KN subtree runs twice — checkpoint once (same pattern as
    # neardup_eval's shared exact side; measured 23 s -> ~12 s at 50x)
    scored = scored.localCheckpoint(eager=True)
    return integer_tercile_buckets(
        scored, ["lang"], "kn_surprisal_milli"
    ).select("doc_id", "lang", "kn_surprisal_milli", "bucket")


def q_doc_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CCNet quality-filter shape: train an interpolated
    KNESER-NEY bigram model on the trusted slice (lang='en' — the
    stand-in for "KenLM trained on Wikipedia") and score EVERY
    document against it. Cross-lingual docs surface as high surprisal
    with many unseen histories; templated English scores low. Strictly
    stronger smoothing than q_doc_bigram_surprisal's add-1 (continuation
    -fertility mass redistribution, Kneser-Ney 1995 / Chen & Goodman
    D=0.75). Milli-nat integer output; exact-count train statistics
    (operators/lm.py:kn_bigram_surprisal)."""
    from etl_spark_spark.operators.lm import kn_bigram_surprisal

    docs = table(
        spark, sf_dir, "documents", columns=["doc_id", "text", "lang"]
    )
    train = docs.filter(F.col("lang") == F.lit("en")).select(
        "doc_id", "text"
    )
    return kn_bigram_surprisal(
        docs.select("doc_id", "text"), train, "doc_id", "text"
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



def q_doc_tfidf_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most TF-IDF-cosine-similar documents per document with
    rare-SHINGLE blocking (trigram df <= 4): candidates come from
    shared rare token trigrams (bounded posting lists — pair space
    scales with rare-shingle coincidence, not corpus squared; unigram
    blocking is vacuous on this corpus, whose 31-word vocabulary makes
    every WORD common while word sequences stay discriminative), the
    cosine is the full unigram-TF-IDF dot over all shared terms,
    verified on narrow pair rows. Integer milli-quantized weights and
    cosines make the double math hash-exact cross-engine; the recall
    contract (common-shingles-only pairs are not candidates) is the
    documented LSH-banding trade
    (operators/retrieval.py:tfidf_topk_similar)."""
    from etl_spark_spark.operators.retrieval import tfidf_topk_similar

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk_similar(docs, "doc_id", "text", k=3, rare_df=4)


def _doc_tfidf_similar_oracle() -> str:
    from etl_spark_spark.operators.retrieval import tfidf_topk_similar_sql

    return tfidf_topk_similar_sql(
        "documents", "doc_id", "text", k=3, rare_df=4
    )


def q_tfidf_block_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of doc_tfidf_similar's rare-shingle blocking
    (round-11, VERDICT r10 task 4 — the one operator whose recall was
    asserted, not measured). Deterministic 1/8 md5 doc sample; ground
    truth = EXACT all-pairs unigram-TF-IDF cosine >= 0.8 among sampled
    docs with full-corpus idf/norms; candidates = the SHIPPED
    tfidf_block_candidates generator (trigram df <= 4, full-corpus
    dfs) restricted to the sample. Reports overall recall AND recall
    within the shingle-reachable truth: on this 31-word-vocabulary
    fixture most high-cosine pairs share NO trigram (frequency
    coincidence — unreachable by any shingle blocker), so overall
    recall is corpus-shape-bound (~0.24) while the df-threshold trade
    itself holds the >=0.9 rung (~0.91), mirroring the MinHash pin
    (operators/retrieval.py:tfidf_block_recall)."""
    from etl_spark_spark.operators.retrieval import tfidf_block_recall

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_block_recall(
        docs, "doc_id", "text", rare_df=4, sim_milli=800, sample_mod=8
    )


def _tfidf_block_recall_oracle() -> str:
    from etl_spark_spark.operators.retrieval import tfidf_block_recall_sql

    return tfidf_block_recall_sql(
        "documents", "doc_id", "text", rare_df=4, sim_milli=800,
        sample_mod=8,
    )


def q_tfidf_blocking_vacuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PINNED vacuity stat for doc_tfidf_similar's shipped
    absolute threshold (round-12, VERDICT r11 task 1): one row of
    (n_docs, threshold_df, n_cand, cand_per_doc_milli) from the
    operator's own candidate generator. The number a user checks
    before trusting a near-empty similarity result — on this fixture
    it makes the measured collapse VISIBLE: 20458 milli-candidates
    per doc at sf0.01 vs 1076 at sf0.1 under the same rare_df=4
    (operators/retrieval.py:tfidf_blocking_stats)."""
    from etl_spark_spark.operators.retrieval import tfidf_blocking_stats

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_blocking_stats(docs, "doc_id", "text", rare_df=4)


def _tfidf_blocking_vacuity_oracle() -> str:
    from etl_spark_spark.operators.retrieval import tfidf_blocking_stats_sql

    return tfidf_blocking_stats_sql("documents", "doc_id", "text", rare_df=4)


def q_tfidf_blocking_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CORPUS-RELATIVE blocking threshold's stat row (round-12):
    df <= max(1, ceil(n_docs * 0.008)), the n_docs riding a 1-row
    broadcast — the scale-stable alternative to an absolute rare_df
    on Heaps-law corpora. On THIS bounded-vocabulary fixture it
    honestly shows the opposite failure: the trigram space caps at
    ~31^3, so the relative cut goes explosive at sf0.1 (df<=40,
    ~226 candidates/doc) where the absolute cut went vacuous — the
    pair of stats queries documents both failure modes of
    threshold blocking on degenerate vocabularies
    (operators/retrieval.py:tfidf_blocking_stats)."""
    from etl_spark_spark.operators.retrieval import tfidf_blocking_stats

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_blocking_stats(
        docs, "doc_id", "text", rare_df_frac=0.008
    )


def _tfidf_blocking_frac_oracle() -> str:
    from etl_spark_spark.operators.retrieval import tfidf_blocking_stats_sql

    return tfidf_blocking_stats_sql(
        "documents", "doc_id", "text", rare_df_frac=0.008
    )


def q_doc_tfidf_similar_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_tfidf_similar through the VACUITY-GUARDED path (round-12):
    min_cand_per_doc=0.5 counts the operator's own candidate pairs
    (1-row aggregate over the checkpointed candidate table) and
    raises when candidates/doc falls below the floor — via a trap row
    unioned into the plan, so it fires even on an empty result. The
    floor passes at both fixture scales (20.5 and 1.08 cand/doc), so
    the oracle gate pins that the guarded plan returns byte-identical
    values to the unguarded one; the sf0.1 TRIP at floor 2.0 is
    pinned in tests/test_retrieval_stats.py in BOTH engines
    (operators/retrieval.py:tfidf_topk_similar)."""
    from etl_spark_spark.operators.retrieval import tfidf_topk_similar

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk_similar(
        docs, "doc_id", "text", k=3, rare_df=4, min_cand_per_doc=0.5
    )


def _doc_tfidf_similar_guarded_oracle() -> str:
    from etl_spark_spark.operators.retrieval import tfidf_topk_similar_sql

    return tfidf_topk_similar_sql(
        "documents", "doc_id", "text", k=3, rare_df=4,
        min_cand_per_doc=0.5,
    )


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



def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("hash join" as ADJACENT tokens —
    what bag-of-words BM25 can't distinguish from scattered terms):
    per-row window test over the token array, map-only, no shuffle
    (operators/retrieval.py:phrase_occurrences)."""
    from etl_spark_spark.operators.retrieval import phrase_occurrences
    from etl_spark_spark.operators.skew import computed_once, fan_out

    # map-only means the whole query runs in the scan's partitioning —
    # ONE task on a single-row-group file, 4.3 s of tokenize + position
    # windows on one core (round-12 profile). fan_out costs one tiny
    # text exchange here and nothing at real scale (no-op when the scan
    # has >= cores splits); computed_once keeps the n_occ > 0 predicate
    # from re-running the whole phrase expression below the exchange.
    docs = fan_out(table(spark, sf_dir, "documents", columns=["doc_id", "text"]))
    tok = docs.select("doc_id", tokens("text").alias("__tok"))
    return tok.select(
        "doc_id",
        computed_once(
            phrase_occurrences("__tok", ["hash", "join"])
        ).alias("n_occ"),
    ).filter(F.col("n_occ") > 0)



def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 top-15 for
    ["hash", "join", "stream"] fused with the positional phrase
    ranking for the adjacent phrase "hash join" (top-15 by occurrence
    count) — the standard RAG-stack combiner (score = Σ 1/(60+rank)).
    Each list contributes an exact small-integer ratio; the fused
    micro-quantized score re-ranks deterministically (ties on doc_id)
    (operators/retrieval.py:rrf_fuse)."""
    from etl_spark_spark.operators.retrieval import (
        bm25_topk,
        phrase_occurrences,
        rrf_fuse,
    )
    from etl_spark_spark.operators.skew import computed_once, fan_out
    from pyspark.sql import Window

    # one shared fan-out feeds both ranking legs (bm25_topk's internal
    # fan_out then sees an already-parallel input and adds nothing):
    # the profile showed 3.9 of this query's 5.2 s in ONE scan task.
    docs = fan_out(table(spark, sf_dir, "documents", columns=["doc_id", "text"]))
    bm25 = bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=15)
    w = Window.orderBy(F.desc("score_micro"), F.col("doc_id"))
    bm25_r = bm25.select(
        "doc_id", F.row_number().over(w).cast("int").alias("rank")
    )
    tok = docs.select("doc_id", tokens("text").alias("__tok"))
    ph = (
        tok.select(
            "doc_id",
            computed_once(
                phrase_occurrences("__tok", ["hash", "join"])
            ).alias("n_occ"),
        )
        .filter(F.col("n_occ") > 0)
        .orderBy(F.desc("n_occ"), F.col("doc_id"))
        .limit(15)
    )
    wp = Window.orderBy(F.desc("n_occ"), F.col("doc_id"))
    ph_r = ph.select(
        "doc_id", F.row_number().over(wp).cast("int").alias("rank")
    )
    return rrf_fuse([bm25_r, ph_r], "doc_id")


def _hybrid_search_rrf_oracle() -> str:
    from etl_spark_spark.operators.retrieval import (
        bm25_topk_sql,
        phrase_occurrences_sql,
        rrf_fuse_sql,
    )

    bm25 = bm25_topk_sql("documents", "doc_id", "text", _BM25_TERMS, k=15)
    bm25_ranked = f"""
SELECT doc_id, CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
       AS INTEGER) AS rank
FROM ({bm25})
"""
    occ = phrase_occurrences_sql("t", ["hash", "join"])
    ph_ranked = f"""
SELECT doc_id, CAST(row_number() OVER (ORDER BY n_occ DESC, doc_id)
       AS INTEGER) AS rank
FROM (
  SELECT doc_id, {occ} AS n_occ
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents)
) WHERE n_occ > 0
ORDER BY n_occ DESC, doc_id LIMIT 15
"""
    return rrf_fuse_sql([bm25_ranked, ph_ranked], "doc_id")


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
    dtm = dt.join(mid, "term")
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
    value carried through — the verify joins vanish from the plan.

    Round-12 cost fix (output value-identical, guide §2.4 "share one
    exchange"): the three per-threshold pipelines — band self-join,
    rep-exact verify join, family expansion, and the three count
    aggregates each — collapsed into ONE threshold-TAGGED pipeline.
    Band keys for all three banding plans explode from a single tagged
    array (each threshold still bands its own prefix of the shared
    64-perm signature), one self-join on (tag, band, key) generates
    every threshold's candidates, one verify join + one tagged family
    expansion replace three of each, and all nine count aggregates
    become one grouped count per side joined back to a literal
    threshold spine (left join + coalesce-0 preserves the empty-
    detector row exactly as the old crossJoin-of-aggregates did). The
    within-family expansion (jaccard 1.0 pairs, >= every threshold by
    construction) is generated once and replicated per tag — verbatim
    what three expand_collapsed_pairs calls produced. 76 scheduler
    jobs -> ~45 at fixture scale; at 100 TB the same rewrite removes
    two full candidate-generation shuffles."""
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
    # shared inputs, materialized once: the collapsed shingle table,
    # the expansion table, and ONE signature at the max perm count —
    # each threshold bands a PREFIX of the same mh columns (identical
    # values to computing its own signature; the md5 pass — the
    # dominant cost — is paid once, not per threshold). Round-12: the
    # SAME checkpointed collapse also feeds the exact side, which
    # previously re-derived the whole tokenize+shingle+collapse chain.
    plans = {
        t: plan_banding(t, _EVAL_TARGET_RECALL, _EVAL_MAX_PERMS)
        for t in _EVAL_THRESHOLDS
    }
    from etl_spark_spark.concurrency import run_concurrently

    sh = shingle_set(toks, "doc_id", word_shingles("t", 3))
    reps_sh, members = collapse_identical_sets(sh, "doc_id")
    # the pinned intermediates materialize as OVERLAPPED driver-thread
    # jobs (guide §2.6): reps_sh/members are independent of each other,
    # and — once both are pinned — the exact prefix-join side and the
    # 64-perm signature side are independent too, so the two heaviest
    # materializations of this query run concurrently instead of
    # back-to-back (round-13; the query's wall is half scheduler gap —
    # 49 jobs / 4.1 s gap over 4.4 s of ideal work in the profile)
    reps_sh, members = run_concurrently(
        reps_sh.localCheckpoint, members.localCheckpoint
    )
    exact, sig = run_concurrently(
        lambda: prefix_filtered_jaccard_pairs(
            toks,
            "doc_id",
            word_shingles("t", 3),
            threshold=min(_EVAL_THRESHOLDS),
            _collapsed=(reps_sh, members),
        ).select("id_a", "id_b", "jaccard").localCheckpoint(),
        lambda: minhash_signature(
            reps_sh, "doc_id", max(np_ for np_, _ in plans.values())
        ).localCheckpoint(),
    )
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
    # tagged band table: every threshold's banding (its own prefix of
    # the shared signature) in ONE exploded array -> ONE self-join
    tags = {t: int(round(t * 100)) for t in _EVAL_THRESHOLDS}
    band_structs = []
    for t in _EVAL_THRESHOLDS:
        num_perms, rows_per_band = plans[t]
        for b in range(num_perms // rows_per_band):
            cols = [
                F.col(f"mh{b * rows_per_band + r}")
                for r in range(rows_per_band)
            ]
            band_structs.append(
                F.struct(
                    F.lit(tags[t]).alias("t"),
                    F.lit(b).alias("band"),
                    F.concat_ws("#", *cols).alias("key"),
                )
            )
    exploded = sig.select(
        F.col("doc_id"), F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.t", "bk.band", "bk.key")
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.t").alias("t"),
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    # per-tag jaccard threshold, the SAME python float literals the
    # per-threshold loop compared against
    thr = None
    for t in _EVAL_THRESHOLDS:
        cond = F.col("t") == F.lit(tags[t])
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    # one verify join (candidates x the checkpointed rep-level exact)
    rep_pairs = cand.join(rep_exact, ["id_a", "id_b"]).filter(
        F.col("jaccard") >= thr
    )
    # tagged expansion, same construction as expand_collapsed_pairs:
    # cross pairs carry the tag through the two member joins; within-
    # family pairs (jaccard 1.0 >= every threshold) are generated once
    # and replicated per tag
    cross = (
        rep_pairs.select("t", "id_a", "id_b")
        .hint("merge")
        .join(
            members.select(
                F.col("__r").alias("id_a"), F.col("__doc").alias("__da")
            ).hint("merge"),
            "id_a",
        )
        .join(
            members.select(
                F.col("__r").alias("id_b"), F.col("__doc").alias("__db")
            ).hint("merge"),
            "id_b",
        )
        .select(
            "t",
            F.least("__da", "__db").alias("id_a"),
            F.greatest("__da", "__db").alias("id_b"),
        )
    )
    tag_spine = F.array(*[F.lit(tags[t]) for t in _EVAL_THRESHOLDS])
    within = (
        members.select("__r", F.col("__doc").alias("__da"))
        .join(
            members.select("__r", F.col("__doc").alias("__db")).hint("merge"),
            "__r",
        )
        .filter(F.col("__da") < F.col("__db"))
        .select(
            F.explode(tag_spine).alias("t"),
            F.col("__da").alias("id_a"),
            F.col("__db").alias("id_b"),
        )
    )
    lsh = cross.unionByName(within)
    # one grouped count per side instead of nine single-row aggregates
    lsh_counts = lsh.groupBy("t").agg(F.count("*").alias("n_lsh"))
    tp_counts = (
        lsh.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= thr)
        .groupBy("t")
        .agg(F.count("*").alias("n_tp"))
    )
    # coalesce-0: sum() over ZERO rows is NULL, but the pre-round-12
    # crossJoin-of-count-aggregates produced 0 for an empty/dup-free
    # corpus — keep that contract (ADVICE r12; value-identical on any
    # corpus with at least one qualifying pair, e.g. every fixture SF)
    exact_counts = exact.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(F.col("jaccard") >= F.lit(t), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            ).cast("long").alias(f"__ne_{tags[t]}")
            for t in _EVAL_THRESHOLDS
        ]
    )
    spark = sig.sparkSession
    spine = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(tags[t]).alias("t"),
                        F.lit(plans[t][0]).cast("long").alias("num_perms"),
                        F.lit(plans[t][1]).cast("long").alias(
                            "rows_per_band"
                        ),
                    )
                    for t in _EVAL_THRESHOLDS
                ]
            )
        ).alias("s")
    ).select("s.t", "s.num_perms", "s.rows_per_band")
    ne = None
    for t in _EVAL_THRESHOLDS:
        cond = F.col("t") == F.lit(tags[t])
        val = F.col(f"__ne_{tags[t]}")
        ne = F.when(cond, val) if ne is None else ne.when(cond, val)
    return (
        spine.join(F.broadcast(lsh_counts), "t", "left")
        .join(F.broadcast(tp_counts), "t", "left")
        .crossJoin(F.broadcast(exact_counts))
        .select(
            F.col("t").cast("long").alias("threshold_pct"),
            "num_perms",
            "rows_per_band",
            ne.alias("n_exact"),
            # coalesce-0 BEFORE the ratios: an empty detector side is a
            # count of 0 in the old crossJoin-of-aggregates form, and
            # recall must read 0.0 (not NULL) in that case
            F.coalesce(F.col("n_lsh"), F.lit(0).cast("long")).alias("n_lsh"),
            F.coalesce(F.col("n_tp"), F.lit(0).cast("long")).alias("n_tp"),
        )
        .select(
            "threshold_pct",
            "num_perms",
            "rows_per_band",
            "n_exact",
            "n_lsh",
            "n_tp",
            (
                F.col("n_tp").cast("double") / F.col("n_exact").cast("double")
            ).alias("recall"),
            (
                F.col("n_tp").cast("double") / F.col("n_lsh").cast("double")
            ).alias("precision"),
        )
    )



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


_DOC_SIMHASH_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM tok),
s AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM s
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


_DOC_LENGTH_WINSOR_SQL = f"""
WITH dist AS (
  SELECT source,
         {checked_measure_sql('n_chars', 'exact_group_quantiles', 'n_chars')} AS v,
         count(*) AS c
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



def _bm25_oracle() -> str:
    from etl_spark_spark.operators.retrieval import bm25_topk_sql

    return bm25_topk_sql("documents", "doc_id", "text", _BM25_TERMS, k=15)



def _surprisal_oracle() -> str:
    from etl_spark_spark.operators.lm import unigram_surprisal_sql

    return unigram_surprisal_sql("documents", "doc_id", "text")



def _dsir_weights_oracle() -> str:
    from etl_spark_spark.operators.lm import dsir_log_weights_sql

    return dsir_log_weights_sql(
        "documents", "doc_id", "text", "source = 'src0'"
    )



def _bigram_surprisal_oracle() -> str:
    from etl_spark_spark.operators.lm import bigram_surprisal_sql

    return bigram_surprisal_sql("documents", "doc_id", "text")


def _bloom_snapshot_oracle() -> str:
    from etl_spark_spark.operators.bloom import WORD_BITS, bloom_sql_ctes

    ctes = bloom_sql_ctes(
        "SELECT md5(lower(trim(text))) AS key FROM documents "
        "WHERE doc_id % 2 = 0",
        _BLOOM_M,
        _BLOOM_K,
    )
    probe_union = " UNION ALL ".join(
        f"SELECT doc_id, key, ('0x' || substr(md5('bf{i}~' || key), 1, 15))"
        f"::BIGINT % {_BLOOM_M} AS pos FROM new"
        for i in range(_BLOOM_K)
    )
    return f"""
WITH {ctes},
new AS (
  SELECT doc_id, md5(lower(trim(text))) AS key
  FROM documents WHERE doc_id % 2 = 1
), probes AS ({probe_union}),
hits AS (
  SELECT p.doc_id,
         bool_and(b.bits IS NOT NULL
                  AND ((b.bits >> CAST(p.pos % {WORD_BITS} AS INT)) & 1) = 1)
           AS bloom_hit
  FROM probes p LEFT JOIN bloom b ON b.word = p.pos // {WORD_BITS}
  GROUP BY 1
), hk AS (
  SELECT DISTINCT key FROM hk_bloom
)
SELECT n.doc_id, h.bloom_hit,
       (hk.key IS NOT NULL) AS exact_dup,
       (h.bloom_hit AND hk.key IS NULL) AS false_positive
FROM new n
JOIN hits h USING (doc_id)
LEFT JOIN hk ON hk.key = n.key
"""


def _kn_perplexity_oracle() -> str:
    from etl_spark_spark.operators.lm import kn_bigram_surprisal_sql

    return kn_bigram_surprisal_sql(
        "documents", "doc_id", "text", "lang = 'en'"
    )


def _ccnet_buckets_oracle() -> str:
    from etl_spark_spark.operators.lm import kn_bigram_surprisal_sql

    kn = kn_bigram_surprisal_sql("documents", "doc_id", "text", "lang = 'en'")
    return f"""
WITH kn AS ({kn}),
scored AS (
  SELECT k.doc_id, d.lang, k.kn_surprisal_milli AS v
  FROM kn k JOIN documents d USING (doc_id)
), dist AS (
  SELECT lang,
         {checked_measure_sql('v', 'integer_tercile_buckets', 'kn_surprisal_milli')} AS v,
         count(*) AS c
  FROM scored GROUP BY 1, 2
), cum AS (
  SELECT lang, v, c,
         sum(c) OVER (PARTITION BY lang ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM dist
), edges AS (
  SELECT lang,
         min(CASE WHEN cum >= (n + 2) // 3 THEN v END) AS e1,
         min(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS e2
  FROM cum GROUP BY 1
)
SELECT s.doc_id, s.lang, s.v AS kn_surprisal_milli,
       CASE WHEN s.v <= e.e1 THEN 'head'
            WHEN s.v <= e.e2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN edges e USING (lang)
"""



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


def q_doc_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL over the corpus (the edit
    counterpart of q:duplicate_spans' audit): every 8-token window
    shared by >= 2 documents survives only in its minimum-id owner;
    every other document drops the covered tokens. The distributed
    stand-in for suffix-array exact-substring dedup (Lee et al. 2022)
    — windows travel as md5 digests + int positions, one uniform-key
    hash aggregate, one digest join back, coverage explode bounded by
    8x the duplicated non-owned instances, and the rebuild is a JVM
    higher-order filter over the original token array. The oracle
    replays ownership, coverage union, and the positional rebuild."""
    from etl_spark_spark.operators.neardup import strip_duplicate_spans

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return strip_duplicate_spans(
        docs, "doc_id", tokens("text"), span_n=8, min_docs=2
    )


_DOC_SPAN_SCRUB_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), sp0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 8
                THEN list_transform(range(1, len(t) - 6),
                     i -> {'p': i,
                           'h': md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                                    t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                                    t[i+6] || ' ' || t[i+7])})
                ELSE [] END) AS s
  FROM toks
), sp AS (
  SELECT doc_id, s.p AS p, s.h AS h FROM sp0
), own AS (
  SELECT h, min(doc_id) AS owner FROM sp
  GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), covpos AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT sp.doc_id AS doc_id, unnest(range(sp.p, sp.p + 8)) AS pos
    FROM sp JOIN own USING (h) WHERE sp.doc_id <> own.owner
  )
), cova AS (
  SELECT doc_id, list(pos) AS cv FROM covpos GROUP BY doc_id
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(t) - len(clean) AS BIGINT) AS n_removed,
       coalesce(array_to_string(clean, ' '), '') AS text_clean
FROM (
  SELECT toks.doc_id, toks.t,
         list_filter(list_transform(range(1, len(toks.t) + 1),
             i -> CASE WHEN list_contains(coalesce(c.cv, []::BIGINT[]), i)
                  THEN NULL ELSE toks.t[i] END),
             x -> x IS NOT NULL) AS clean
  FROM toks LEFT JOIN cova c USING (doc_id)
)
"""


def q_doc_span_scrub_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lee-et-al ExactSubstr semantics: every 8-token window with
    >= 2 occurrences ANYWHERE (intra- or cross-document) survives only
    at its lexicographically first (doc id, position) occurrence —
    repeats inside the originating document are scrubbed too, unlike
    q:doc_span_scrub's conservative owner-keeps-all scope. The oracle
    replays the keep-first rule with a row_number over (window hash)
    ordered by (doc id, position)."""
    from etl_spark_spark.operators.neardup import strip_duplicate_spans

    docs = table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return strip_duplicate_spans(
        docs, "doc_id", tokens("text"), span_n=8, scope="first-occurrence"
    )


_DOC_SPAN_SCRUB_GLOBAL_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), sp0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 8
                THEN list_transform(range(1, len(t) - 6),
                     i -> {'p': i,
                           'h': md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                                    t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                                    t[i+6] || ' ' || t[i+7])})
                ELSE [] END) AS s
  FROM toks
), sp AS (
  SELECT doc_id, s.p AS p, s.h AS h FROM sp0
), ranked AS (
  SELECT doc_id, p,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
  FROM sp
), covpos AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, unnest(range(p, p + 8)) AS pos
    FROM ranked WHERE rn > 1
  )
), cova AS (
  SELECT doc_id, list(pos) AS cv FROM covpos GROUP BY doc_id
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(t) - len(clean) AS BIGINT) AS n_removed,
       coalesce(array_to_string(clean, ' '), '') AS text_clean
FROM (
  SELECT toks.doc_id, toks.t,
         list_filter(list_transform(range(1, len(toks.t) + 1),
             i -> CASE WHEN list_contains(coalesce(c.cv, []::BIGINT[]), i)
                  THEN NULL ELSE toks.t[i] END),
             x -> x IS NOT NULL) AS clean
  FROM toks LEFT JOIN cova c USING (doc_id)
)
"""


__all__ = [
    'q_doc_text_stats',
    'q_doc_lang_id',
    'q_doc_exact_dedup',
    'q_neardup_minhash',
    'q_neardup_bucket_cap',
    'q_neardup_ngram_jaccard',
    'q_neardup_prefix_jaccard',
    'q_doc_simhash',
    'q_neardup_simhash',
    'q_neardup_simhash_exact',
    'q_doc_fingerprints',
    'q_doc_group_sample',
    'q_doc_bigram_novelty',
    'q_doc_split_counts',
    'q_doc_stratified_sample',
    'q_doc_group_split',
    'q_doc_repetition',
    'q_doc_pii_scrub',
    'q_source_mix_sample',
    'q_doc_shuffle_order',
    'q_fuzzy_code_match',
    'q_doc_source_cap',
    'q_vocab_topk',
    'q_doc_decontaminate',
    'q_doc_decontaminate_bloom',
    'q_doc_pack',
    'q_doc_top_terms',
    'q_neardup_clusters',
    'q_doc_quality_model',
    'q_doc_incremental_dedup',
    'q_doc_chunks',
    'q_doc_weighted_sample',
    'q_doc_curation',
    'q_doc_curation_capped',
    'q_doc_training_prep',
    'q_doc_length_winsor',
    'q_doc_bigram_surprisal',
    'q_doc_kn_perplexity',
    '_kn_perplexity_oracle',
    'q_bloom_snapshot_dedup',
    '_bloom_snapshot_oracle',
    'q_cms_term_counts',
    '_cms_term_counts_oracle',
    'q_doc_ccnet_buckets',
    '_ccnet_buckets_oracle',
    'q_hll_distinct_tokens',
    '_hll_distinct_oracle',
    'q_hll_stream_fold',
    'q_doc_k_anonymity',
    '_DOC_K_ANONYMITY_SQL',
    '_hll_assemble',
    'q_hll_source_overlap',
    '_hll_source_overlap_oracle',
    'q_doc_training_mix',
    'q_doc_epoch_shuffle',
    'q_doc_dsir_weights',
    'q_cluster_canonicalize',
    'q_split_leakage',
    'q_doc_budget_mix',
    'q_lang_id_eval',
    'q_inverted_index',
    'q_bm25_search',
    'q_hybrid_search_rrf',
    '_hybrid_search_rrf_oracle',
    'q_doc_tfidf_similar',
    '_doc_tfidf_similar_oracle',
    'q_tfidf_block_recall',
    '_tfidf_block_recall_oracle',
    'q_tfidf_blocking_vacuity',
    '_tfidf_blocking_vacuity_oracle',
    'q_tfidf_blocking_frac',
    '_tfidf_blocking_frac_oracle',
    'q_doc_tfidf_similar_guarded',
    '_doc_tfidf_similar_guarded_oracle',
    '_BM25_TERMS',
    'q_doc_surprisal',
    'q_duplicate_spans',
    'q_column_entropy',
    'q_phrase_search',
    'q_bpe_merges',
    'q_bpe_token_counts',
    'q_doc_containment',
    'q_term_pmi',
    '_EVAL_THRESHOLDS',
    '_EVAL_TARGET_RECALL',
    '_EVAL_MAX_PERMS',
    'q_neardup_eval',
    'q_neardup_recall_sampled',
    'q_doc_gopher_filter',
    'q_doc_length_histogram',
    'q_source_overlap',
    '_TOKS',
    '_EN_PAT',
    '_DOC_TEXT_STATS_SQL',
    '_LANGS',
    '_LANG_PATS',
    '_lang_case_sql',
    '_DOC_LANG_ID_SQL',
    '_LANG_ID_EVAL_SQL',
    '_DOC_EXACT_DEDUP_SQL',
    '_SHINGLES',
    '_MH_COLS',
    '_BANDS_SQL',
    '_NEARDUP_MINHASH_SQL',
    '_NEARDUP_BUCKET_CAP_SQL',
    '_CLUSTER_CANONICALIZE_SQL',
    '_SPLIT_LEAKAGE_SQL',
    '_DOC_INCREMENTAL_DEDUP_SQL',
    '_NEARDUP_NGRAM_SQL',
    '_NEARDUP_PREFIX_SQL',
    '_DOC_SIMHASH_SQL',
    '_NEARDUP_SIMHASH_SQL',
    '_NEARDUP_SIMHASH_EXACT_SQL',
    '_DOC_FINGERPRINTS_SQL',
    '_DOC_GROUP_SAMPLE_SQL',
    '_DOC_BIGRAM_NOVELTY_SQL',
    '_BUCKET1',
    '_BUCKET2',
    '_DOC_SPLIT_COUNTS_SQL',
    '_DOC_STRATIFIED_SAMPLE_SQL',
    '_DOC_GROUP_SPLIT_SQL',
    '_DOC_REPETITION_SQL',
    '_DOC_PII_SCRUB_SQL',
    '_SOURCE_MIX_SAMPLE_SQL',
    '_DOC_CHUNKS_SQL',
    '_DOC_WEIGHTED_SAMPLE_SQL',
    '_DOC_SHUFFLE_ORDER_SQL',
    '_FUZZY_CODE_MATCH_SQL',
    '_DOC_SOURCE_CAP_SQL',
    '_VOCAB_TOPK_SQL',
    '_DOC_DECONTAMINATE_SQL',
    '_DOC_PACK_SQL',
    '_DOC_TOP_TERMS_SQL',
    '_NEARDUP_CLUSTERS_SQL',
    '_CURATION_BASE_CTES',
    '_CURATION_CTES',
    '_DOC_CURATION_SQL',
    '_DOC_CURATION_CAPPED_SQL',
    '_DOC_QUALITY_MODEL_SQL',
    '_DOC_TRAINING_PREP_SQL',
    '_DOC_LENGTH_WINSOR_SQL',
    '_DOC_BUDGET_MIX_SQL',
    '_INVERTED_INDEX_SQL',
    '_bm25_oracle',
    '_surprisal_oracle',
    '_dsir_weights_oracle',
    '_bigram_surprisal_oracle',
    '_DUPLICATE_SPANS_SQL',
    '_entropy_col_sql',
    '_COLUMN_ENTROPY_SQL',
    '_phrase_search_oracle',
    '_bpe_merges_oracle',
    '_bpe_token_counts_oracle',
    '_DOC_CONTAINMENT_SQL_TMPL',
    '_TERM_PMI_SQL',
    '_mh_cols_sql',
    '_bands_sql_for',
    '_neardup_eval_tuned_sql',
    '_neardup_recall_sampled_sql',
    '_DOC_GOPHER_FILTER_SQL',
    '_DOC_LENGTH_HISTOGRAM_SQL',
    '_SOURCE_OVERLAP_SQL',
    'q_doc_span_scrub',
    '_DOC_SPAN_SCRUB_SQL',
    'q_doc_span_scrub_global',
    '_DOC_SPAN_SCRUB_GLOBAL_SQL',
]
