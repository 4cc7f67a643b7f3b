"""Bloom-filter membership for cross-snapshot dedup.

The 100 TB problem this solves: deduplicating each NEW crawl batch
against an ever-growing history. The anti-join answer re-shuffles
O(|history|) rows per batch; the Bloom answer pays one pass over the
history to build a compact bitmap, after which every batch costs
O(k * |batch|) — the history never moves again. False positives are
bounded by the classic (1 - e^{-kn/m})^k rate (size ``m_bits`` at
~10 bits per history key for k=4..7); false NEGATIVES are structurally
impossible, so "bloom says new" is always safe to keep.

Representation: the filter is a DataFrame of (word, bits) rows — each
word holds 63 bit positions of the bitmap (63, not 64, so every mask
stays a positive BIGINT in engines without unsigned types). Built with
one hash aggregate (``bit_or`` of single-bit masks); merging two
filters of the same (m_bits, k) is the same ``bit_or`` regroup, so the
build is embarrassingly incremental. A 1 GiB bitmap is ~136M words —
still a broadcast-or-bucketed dimension against a trillion-row probe.

Probing joins each key's k (word, bit) probes against the filter on
``word`` and requires all k bits set. Partial aggregation keeps the
per-key fan-out map-side; the join is keyed on word, so a hot filter
word never concentrates more than its own probes.

Everything is md5-derived (rung: ORACLE_NOTES "hashes") so an ANSI-SQL
oracle replays the filter bit-for-bit: position_i(x) =
int64(md5("bf{i}~" || x)[:15 hex]) mod m_bits.

Reference scope: the etl-spark reference (533-line Spark job) has no
membership sketches; this is a §7 LLM-pipeline extension (crawl
snapshot dedup), same family as operators/neardup.py's incremental
index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column

WORD_BITS = 63  # positions per word; 63 keeps 1<<bit positive in int64


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a key: md5 salted per hash, first 15 hex
    chars as int64 (60 bits, non-negative), mod m_bits."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{i}~"), key)), 1, 15),
            16,
            10,
        ).cast("long")
        % F.lit(int(m_bits))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key: Column | str, m_bits: int, k: int = 4
) -> DataFrame:
    """Build the filter over ``key`` (any string expression): returns
    (word: long, bits: long) with only non-empty words materialized.
    One explode + one hash aggregate; merge two builds by unioning and
    re-aggregating ``bit_or(bits)``."""
    if m_bits <= 0 or k <= 0:
        raise ValueError(f"m_bits and k must be positive, got {m_bits}, {k}")
    key = F.col(key) if isinstance(key, str) else key
    pos = df.select(
        F.explode(F.array(*_positions(key, m_bits, k))).alias("__pos")
    )
    return (
        pos.select(
            # integer div (not /-then-cast: double division loses
            # exactness past 2^53 and DuckDB // is true int division)
            F.expr(f"__pos div {WORD_BITS}").alias("word"),
            # F.shiftleft only takes a literal shift; expr form takes
            # the column
            F.expr(f"shiftleft(1L, cast(__pos % {WORD_BITS} as int))").alias(
                "__mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key: Column | str,
    m_bits: int,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col``: true iff ALL k of the key's bits are set in
    ``bloom`` (i.e. "maybe in the history" — false positives possible
    at the configured rate, false negatives never). Plan: distinct key
    values, explode k probes per key, one left join keyed on word,
    bool_and back to one verdict per KEY VALUE, null-safe-joined back
    onto the input. Re-keying on the key value (not a per-row id) is
    deterministic under re-evaluation — a monotonic row id can differ
    between the two plan branches when the caller's df contains a
    shuffle (reduce-side row order is unordered), silently mis-pairing
    verdicts — and duplicate keys probe once instead of once per row.
    A NULL key hashes to NULL positions and verdicts false ("not in
    history"), matching the build side, which never stores NULL keys.
    """
    key = F.col(key) if isinstance(key, str) else key
    keyed = df.withColumn("__bkey", key)
    probes = (
        keyed.select("__bkey")
        .distinct()
        .select(
            "__bkey",
            F.explode(F.array(*_positions(F.col("__bkey"), m_bits, k))).alias(
                "__pos"
            ),
        )
        .select(
            "__bkey",
            F.expr(f"__pos div {WORD_BITS}").alias("word"),
            (F.col("__pos") % WORD_BITS).cast("int").alias("__bit"),
        )
    )
    hit = probes.join(bloom, "word", "left").select(
        "__bkey",
        (
            F.col("bits").isNotNull()
            & (F.expr("(shiftright(bits, __bit) & 1)") == F.lit(1))
        ).alias("__h"),
    )
    verdict = hit.groupBy("__bkey").agg(F.bool_and("__h").alias(out_col))
    # NULL keys explode to NULL positions -> __pos is NULL -> the word
    # join misses -> bool_and(false) = false; the null-safe join key
    # carries that false verdict back to the NULL-key input rows. Left
    # join + coalesce(False) covers the only unmatched case: a NULL key
    # whose explode produced no rows cannot occur (array of k nulls
    # still explodes k rows), but the guard costs nothing.
    joined = keyed.join(
        verdict, keyed["__bkey"].eqNullSafe(verdict["__bkey"]), "left"
    )
    return (
        joined.drop(verdict["__bkey"])
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
        .drop("__bkey")
    )


def bloom_probe_inline(
    df: DataFrame,
    bloom: DataFrame,
    key: Column | str,
    m_bits: int,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """MAP-ONLY probe: collect the (constant-size-by-design) bitmap
    into the plan as a dense array literal and evaluate membership as
    a pure per-row expression — zero shuffle, zero joins, the shape a
    broadcast variable gives a hand-written job. The collect is
    bounded by m_bits/63 longs (2^20 bits -> 16k words ≈ 128 KiB),
    independent of how many keys built the filter; for bitmaps past
    ~2^24 bits prefer :func:`bloom_probe` (the join path) so the plan
    stays small."""
    key = F.col(key) if isinstance(key, str) else key
    n_words = (int(m_bits) + WORD_BITS - 1) // WORD_BITS
    if n_words > (1 << 24) // WORD_BITS:
        raise ValueError(
            f"m_bits={m_bits} too large for an inline bitmap; "
            "use bloom_probe"
        )
    sparse = {r["word"]: r["bits"] for r in bloom.collect()}
    dense = [sparse.get(w, 0) for w in range(n_words)]
    # ship the dense bitmap as a BROADCAST 1-row array — NOT F.lit(list):
    # a 16k-element CreateArray literal is rebuilt per row by codegen
    # (measured 2.3 s -> 15 s on the decontaminate composite); a
    # broadcast row stores it once as ArrayData with O(1) element_at
    spark = df.sparkSession
    arr_df = spark.createDataFrame([(dense,)], "__bloom_arr: array<long>")
    out = df.crossJoin(F.broadcast(arr_df))
    arr = F.col("__bloom_arr")
    checks = []
    for p in _positions(key, m_bits, k):
        # p < m_bits <= 2^24, so (p - p%63)/63 is exact in double and
        # the cast truncates losslessly (named-column-free alternative
        # to `div`, which F.expr can't reach from a Column)
        w = ((p - (p % WORD_BITS)) / WORD_BITS).cast("long")
        bit = (p % WORD_BITS).cast("int")
        checks.append(
            (
                F.call_function(
                    "shiftright", F.element_at(arr, (w + 1).cast("int")), bit
                ).bitwiseAND(F.lit(1))
                == F.lit(1)
            )
        )
    verdict = checks[0]
    for c in checks[1:]:
        verdict = verdict & c
    return out.withColumn(out_col, verdict).drop("__bloom_arr")


def bloom_sql_ctes(
    history_select: str, m_bits: int, k: int = 4, name: str = "bloom"
) -> str:
    """DuckDB CTE body mirroring :func:`bloom_build`:
    ``history_select`` must yield one column ``key``; emits CTE
    ``{name}(word, bits)``. Compose into a WITH clause."""
    probes = " UNION ALL ".join(
        f"SELECT ('0x' || substr(md5('bf{i}~' || key), 1, 15))::BIGINT "
        f"% {int(m_bits)} AS pos FROM hk_{name}"
        for i in range(k)
    )
    return f"""hk_{name} AS ({history_select}),
pos_{name} AS ({probes}),
{name} AS (
  SELECT pos // {WORD_BITS} AS word,
         bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INT)) AS bits
  FROM pos_{name} GROUP BY 1
)"""
