"""Unit tests for the round-4 profiling/curation operators: Gopher rule
filter, functional-dependency audit, cross-source shingle overlap.
Deliberate small fixtures with hand-computed expectations (the sf0.01
oracle mirror checks these same operators against DuckDB end to end;
these tests pin the SEMANTICS on inputs chosen to hit each rule edge).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_spark.functions.text import (
    gopher_rule_counters,
    gopher_rule_flags,
    stopword_hits,
    tokens,
    word_shingles,
)
from etl_spark_spark.operators.corpus_stats import source_shingle_overlap
from etl_spark_spark.operators.quality import functional_dependencies


def test_gopher_rules_each_edge(spark):
    # 60 words, all alpha, mean word length 41/10 = 4.1 (in [3, 10])
    good = " ".join(["quick brown foxes jumped over the lazy dog and ran"] * 6)
    too_short = "the and of to tiny"
    symbol_spam = " ".join(["####"] * 30 + ["the and of to a word"] * 10)
    no_stopwords = " ".join(["zq"] * 60)
    long_words = " ".join(["the and of to"] * 13) + " " + "x" * 2000
    df = spark.createDataFrame(
        [
            (1, good),
            (2, too_short),
            (3, symbol_spam),
            (4, no_stopwords),
            (5, long_words),
        ],
        "doc_id long, text string",
    )
    counters = gopher_rule_counters("text")
    flags = gopher_rule_flags(
        counters, stopword_hits("text", ["the", "a", "and", "of", "to"])
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            *[v.alias(k) for k, v in counters.items()],
            *[v.alias(k) for k, v in flags.items()],
        ).collect()
    }
    assert rows[1].n_words == 60
    assert all(
        getattr(rows[1], f)
        for f in ["r_word_count", "r_word_len", "r_alpha", "r_symbol", "r_stop"]
    )
    assert not rows[2].r_word_count and rows[2].r_stop
    # 30 of 70 tokens are pure symbols: symbol + alpha rules both trip
    assert not rows[3].r_symbol and not rows[3].r_alpha
    assert rows[3].r_word_count
    assert not rows[4].r_stop
    # one 2000-char token pushes mean word length over 10
    assert not rows[5].r_word_len


def test_functional_dependencies_holds_and_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "z")],
        "id long, lhs string, rhs string",
    )
    out = {
        (r.tbl, r.lhs, r.rhs): r
        for r in functional_dependencies(
            df, [("lhs", "rhs"), ("id", "rhs")], "t"
        ).collect()
    }
    fd = out[("t", "lhs", "rhs")]
    assert (fd.n_groups, fd.n_violating, fd.holds) == (2, 1, False)
    key = out[("t", "id", "rhs")]
    assert (key.n_groups, key.n_violating, key.holds) == (4, 0, True)


def test_source_shingle_overlap_counts(spark):
    # s1 and s2 share exactly the shingle "a b c"; s3 shares nothing
    df = spark.createDataFrame(
        [
            ("s1", "a b c d"),
            ("s2", "a b c"),
            ("s3", "q r s t"),
        ],
        "source string, text string",
    )
    t = df.select("source", tokens("text").alias("t"))
    out = source_shingle_overlap(t, "source", word_shingles("t", 3))
    rows = {(r.source_a, r.source_b): r for r in out.collect()}
    assert set(rows) == {("s1", "s2")}
    r = rows[("s1", "s2")]
    # s1 shingles: {a b c, b c d}; s2: {a b c}
    assert (r.n_shared, r.n_a, r.n_b) == (1, 2, 1)


def test_auto_n_blocks_bounds_per_task_matrix(spark):
    """The blocked cosine scorer must keep per-task rows ~flat as the
    corpus grows: B = ceil(N / _BLOCK_TARGET_ROWS), so the worst
    (i, j) group holds <= ~2 * _BLOCK_TARGET_ROWS rows and the numpy
    score matrix stays tens of MB whatever N is (the fixed n_blocks=8
    default built a ~5 GB matrix at 200k vectors and crashed the
    Arrow workers — the round-4 100x-replica finding)."""
    from etl_spark_spark.operators.similarity import (
        _BLOCK_TARGET_ROWS,
        _auto_n_blocks,
    )

    for n in (0, 1, 2_000, 200_000, 5_000_000):
        df = spark.range(n).select(F.col("id"))
        b = _auto_n_blocks(df) if n <= 2_000 else max(
            8, -(-n // _BLOCK_TARGET_ROWS)
        )  # big Ns: arithmetic only, no need to build the DataFrame job
        assert b >= 8
        per_block = -(-max(n, 1) // b)
        assert per_block <= _BLOCK_TARGET_ROWS
        # float64 score matrix for a cross-block pair, in bytes
        assert (per_block ** 2) * 8 <= 64 << 20


def test_grouped_block_count_sized_from_largest_group(spark):
    """The clustered scorer's auto block count must derive from the
    LARGEST cluster, not the corpus: every row is shuffled n_blocks
    times, so corpus-derived sizing makes the candidate shuffle
    O(N^2/target) rows — forfeiting the k-independent-subproblems win
    clustering buys (code-review finding, round 4)."""
    from etl_spark_spark.operators.similarity import (
        _BLOCK_TARGET_ROWS,
        _max_group_blocks,
    )

    # 12,288 rows in 12 balanced clusters of 1,024: corpus-derived
    # sizing would give ceil(12288/2048) = 6; group-derived must give
    # the floor (largest group fits one target block)
    df = spark.range(12 * 1024).select(
        F.col("id"), (F.col("id") % 12).alias("cluster")
    )
    assert _max_group_blocks(df, "cluster") == 4
    # one hot cluster of 3 * target rows dominates the sizing
    skew = spark.range(3 * _BLOCK_TARGET_ROWS).select(
        F.col("id"), F.lit(0).alias("cluster")
    )
    assert _max_group_blocks(skew, "cluster") == 4  # floor still binds
    skew9 = spark.range(9 * _BLOCK_TARGET_ROWS).select(
        F.col("id"), F.lit(0).alias("cluster")
    )
    assert _max_group_blocks(skew9, "cluster") == 9
