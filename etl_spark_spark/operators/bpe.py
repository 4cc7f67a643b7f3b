"""Distributed BPE tokenizer training (LLM-data-pipeline extension).

Sennrich-style byte-pair-encoding merge learning, the way a training
pipeline actually runs it at scale:

- the corpus collapses ONCE to the distinct-word frequency table
  (explode + hash aggregate) — all later rounds work on that compact
  table, never on the corpus;
- each round counts adjacent symbol pairs weighted by word frequency
  (map-side bigram expansion + one hash aggregate), takes the argmax
  (deterministic tie-break: count desc, then pair lexicographically),
  and applies the merge to every word — per round the DRIVER receives
  exactly ONE row (the winning pair), like the per-iteration scalar in
  pagerank/connected-components;
- lineage is truncated every round (localCheckpoint), so the plan
  depth stays flat across merges.

Cross-engine exactness (the reason for the string representation):
word symbol sequences are SEP-joined strings (leading + trailing SEP,
SEP = U+001F) and a merge is ONE literal ``replace`` of
``SEP a SEP b SEP`` with ``SEP ab SEP``. Both Spark and DuckDB
implement literal replace as the same left-to-right non-overlapping
scan that resumes AFTER each replacement, so the merge positions —
including the consumed-boundary behavior on runs like ``a b a b``
(the second occurrence keeps its old symbols until a later round) —
are engine-identical by construction. This is a deterministic greedy
BPE variant, not a bit-for-bit HuggingFace clone; what the oracle
pins is that an independent engine replays the identical recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

SEP = "\x1f"
END_OF_WORD = "</w>"


def word_symbol_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct-word frequency table with the initial character-level
    symbol string: ``SEP c1 SEP c2 ... SEP </w> SEP``."""
    # NOT fanned out (round-13): round-12 added a fan_out here on a
    # "neutral within noise" same-session A/B, but the driver's cold
    # protocol measured the bpe family >=2.4-3x SLOWER (bpe_token_counts
    # 4.33 s, bpe_merges 3.45 s from <1.45 s) — tokenize+explode feeding
    # a hash-aggregate reducer is the efficient-partial-agg shape where
    # an extra raw-row exchange only costs (the round-12 quantile-family
    # law, OPTIMIZATION_r12.md G4/wave-2).
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    s = F.concat(
        F.lit(SEP),
        F.array_join(chars, SEP),
        F.lit(SEP + END_OF_WORD + SEP),
    )
    return words.select("w", "cnt", s.alias("s"))


def _pair_counts(wt: DataFrame) -> DataFrame:
    arr = F.filter(F.split("s", SEP), lambda x: x != F.lit(""))
    bigr = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 1),
        lambda i: F.struct(
            F.element_at(arr, i).alias("a"),
            F.element_at(arr, i + 1).alias("b"),
        ),
    )
    return (
        wt.select("cnt", F.explode(bigr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 6,
    min_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns [(left, right,
    pair_count), ...] in merge order. Stops early if the best pair's
    weighted count drops below ``min_count``."""
    wt = word_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(wt)
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((a, b, c))
        wt = wt.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(SEP + a + SEP + b + SEP),
                F.lit(SEP + a + b + SEP),
            ),
        ).localCheckpoint()
    return merges


def _bpe_cte_stages(table: str, text_col: str, n_merges: int) -> list[str]:
    """The shared chained-CTE merge recurrence both SQL builders
    assemble from (w0 .. w{n_merges}, pairs{k}, best{k}) — a single
    source of truth so neither builder has to carve up the other's
    finished SQL string."""
    sep = SEP
    stages = [
        f"""
w0 AS (
  SELECT w, count(*) AS cnt,
         '{sep}' || array_to_string(
             list_transform(range(1, strlen(w) + 1), i -> w[i]), '{sep}')
         || '{sep}{END_OF_WORD}{sep}' AS s
  FROM (
    SELECT unnest(regexp_split_to_array(lower(trim({text_col})), '\\s+')) AS w
    FROM {table}
  ) WHERE w <> '' GROUP BY w
)"""
    ]
    for k in range(n_merges):
        stages.append(
            f"""
pairs{k} AS (
  SELECT p[1] AS a, p[2] AS b, sum(cnt) AS c FROM (
    SELECT cnt,
           unnest(list_transform(range(1, len(arr)),
                                 i -> [arr[i], arr[i + 1]])) AS p
    FROM (
      SELECT cnt,
             list_filter(string_split(s, '{sep}'), x -> x <> '') AS arr
      FROM w{k}
    )
  ) GROUP BY 1, 2
),
best{k} AS (SELECT a, b, c FROM pairs{k} ORDER BY c DESC, a, b LIMIT 1),
w{k + 1} AS (
  SELECT w.w, w.cnt,
         replace(w.s, '{sep}' || b.a || '{sep}' || b.b || '{sep}',
                 '{sep}' || b.a || b.b || '{sep}') AS s
  FROM w{k} w, best{k} b
)"""
        )
    return stages


def train_bpe_sql(
    table: str, text_col: str, n_merges: int = 6
) -> str:
    """DuckDB mirror of :func:`train_bpe`: the same recurrence as
    ``n_merges`` chained CTE stages, emitting (rank, lhs, rhs, merged,
    pair_count) — the exact table the Spark query builds from the
    collected merges."""
    stages = _bpe_cte_stages(table, text_col, n_merges)
    finals = " UNION ALL ".join(
        f"SELECT {k + 1} AS rank, a AS lhs, b AS rhs, a || b AS merged, "
        f"CAST(c AS BIGINT) AS pair_count FROM best{k}"
        for k in range(n_merges)
    )
    return "WITH " + ",".join(stages) + "\n" + finals


def bpe_token_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 6,
) -> DataFrame:
    """Train BPE on the corpus, then tokenize every document with the
    learned merges — the real token-budget counter (whitespace and
    regex counts only approximate what a trained tokenizer charges).

    Efficient apply: merges act on the DISTINCT-WORD table (each word
    tokenized once, however often it occurs), then documents join their
    words and sum per-word token counts — one explode + one join keyed
    by word + one per-doc aggregate. Returns (id_col, n_words,
    bpe_tokens) where bpe_tokens includes the </w> end-of-word marker
    fused into the final symbol when learned."""
    merges = train_bpe(docs, text_col, n_merges=n_merges)
    wt = word_symbol_table(docs, text_col)
    s = F.col("s")
    for a, b, _ in merges:
        s = F.replace(s, F.lit(SEP + a + SEP + b + SEP), F.lit(SEP + a + b + SEP))
    per_word = wt.select(
        "w",
        F.size(F.filter(F.split(s, SEP), lambda x: x != F.lit(""))).alias(
            "__wtoks"
        ),
    )
    # NOT fanned out (round-13) — same driver-measured revert as
    # word_symbol_table above.
    doc_words = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.col("w") != "")
    return (
        doc_words.join(per_word, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__wtoks").alias("bpe_tokens"),
        )
    )


def bpe_token_counts_sql(
    table: str, id_col: str, text_col: str, n_merges: int = 6
) -> str:
    """DuckDB mirror of :func:`bpe_token_counts`: reuses the chained
    merge stages of :func:`train_bpe_sql` and applies the final symbol
    table back to the documents."""
    stages = ",".join(_bpe_cte_stages(table, text_col, n_merges))
    return f"""
WITH {stages},
per_word AS (
  SELECT w, len(list_filter(string_split(s, '{SEP}'), x -> x <> ''))
           AS wtoks
  FROM w{n_merges}
),
doc_words AS (
  SELECT {id_col},
         unnest(regexp_split_to_array(lower(trim({text_col})), '\\s+')) AS w
  FROM {table}
)
SELECT d.{id_col}, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(p.wtoks) AS BIGINT) AS bpe_tokens
FROM doc_words d JOIN per_word p USING (w)
WHERE d.w <> ''
GROUP BY 1
"""
