"""Corpus language-model scoring (LLM-data-pipeline extension).

CCNet-style quality filtering ranks documents by perplexity under a
language model trained on the corpus (or a reference corpus). Real
pipelines use a KenLM 5-gram; the distributed mechanics — train token
statistics over the whole corpus, then score every document against
them — are engine work, and that is what this module implements with a
UNIGRAM model whose results an ANSI-SQL oracle can reproduce exactly.

Mean surprisal of document d: ``ln(total) - (Σ_t n_dt · ln(c_t)) / L``
where ``c_t`` is the corpus count of term t, ``total`` the corpus token
count and ``L`` the document length. High surprisal = tokens the corpus
rarely uses (gibberish / OCR noise); suspiciously low surprisal =
boilerplate made of the corpus's most common tokens.

Numerics: the weighted ``ln`` sum is order-dependent at the last-ulp
level (and JVM vs libm ``ln`` differ by 1 ulp on ~4% of arguments), so
the score is emitted milli-scaled (``round(x*1000)::bigint``, ~1e-9
accumulated error vs a 1e-3 quantum) — bit-stable across engines and
shuffle orders while keeping milli-nat resolution.

Scale: explode → two hash aggregates (term stats, per-doc fold) + one
shuffle join on term; the 1-row corpus total rides a broadcast
crossJoin. Nothing driver-side, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def unigram_surprisal(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean unigram surprisal in milli-nats.

    Returns ``(id_col, n_tokens, n_terms, mean_surprisal_milli)``.
    """
    dt = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("__term"))
        .groupBy(id_col, "__term")
        .agg(F.count("*").alias("__n_dt"))
    )
    vocab = dt.groupBy("__term").agg(F.sum("__n_dt").alias("__c_t"))
    total = vocab.agg(F.sum("__c_t").alias("__total"))
    per_doc = (
        dt.join(vocab, "__term")
        .groupBy(id_col)
        .agg(
            F.sum("__n_dt").alias("n_tokens"),
            F.count("*").alias("n_terms"),
            F.sum(
                F.col("__n_dt").cast("double")
                * F.log(F.col("__c_t").cast("double"))
            ).alias("__sum_ln"),
        )
    )
    mean = (
        F.log(F.col("__total").cast("double"))
        - F.col("__sum_ln") / F.col("n_tokens").cast("double")
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        "n_terms",
        F.round(mean * 1000.0).cast("long").alias("mean_surprisal_milli"),
    )


def unigram_surprisal_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`unigram_surprisal`."""
    return f"""
WITH tok AS (
  SELECT {id_col},
         unnest(regexp_split_to_array(lower(trim({text_col})), '\\s+')) AS term
  FROM {table}
), dt AS (
  SELECT {id_col}, term, count(*) AS n_dt FROM tok GROUP BY 1, 2
), vocab AS (
  SELECT term, sum(n_dt) AS c_t FROM dt GROUP BY 1
), tot AS (
  SELECT sum(c_t) AS total FROM vocab
), per_doc AS (
  SELECT d.{id_col},
         CAST(sum(d.n_dt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_terms,
         sum(CAST(d.n_dt AS DOUBLE) * ln(CAST(v.c_t AS DOUBLE))) AS sum_ln
  FROM dt d JOIN vocab v USING (term)
  GROUP BY 1
)
SELECT {id_col}, n_tokens, n_terms,
       CAST(round((ln(CAST(total AS DOUBLE))
                   - sum_ln / CAST(n_tokens AS DOUBLE)) * 1000.0) AS BIGINT)
         AS mean_surprisal_milli
FROM per_doc, tot
"""
