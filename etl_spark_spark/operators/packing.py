"""Sequence packing: assign documents to fixed-token-budget training
chunks (LLM-data-pipeline extension; no reference counterpart).

The variant implemented is offset packing — the distributed-friendly
form of "concatenate the shard, then cut every ``budget`` tokens": lay
documents end-to-end in a deterministic order and assign each doc to
the chunk its START offset falls in. Chunk k holds the docs whose
cumulative start lies in [k*budget, (k+1)*budget); a doc may run past
its chunk boundary (the trainer's loader truncates/carries), so every
chunk is ≥ budget-full except the shard's last — no bin-packing search,
no data-dependent iteration, one window sum.

Scale design: the running offset is a window cumsum, which is
inherently sequential PER PARTITION — so packing is always scoped to
``shard_cols`` (crawl/source/date shards). Each shard sorts and sums
independently in parallel; nothing is globally ordered. A global pack
over 100 TB would serialize on one task — shard first (any curation
pipeline already has natural shards), then pack.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_by_tokens", "pack_by_token_budget"]


def pack_by_token_budget(
    df: DataFrame,
    shard_cols: Sequence[str],
    order_col: Column | str,
    tokens_col: Column | str,
    budget: int,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Add (``pack_col``, ``offset_col``): the chunk index within the
    shard and the doc's token offset from the shard start.

    ``order_col`` must be unique per shard (use the doc id) so the
    layout — and therefore every chunk's contents — is deterministic
    across runs and engines.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(toks).over(w), F.lit(0))
    return df.withColumn(offset_col, start).withColumn(
        pack_col, F.floor(F.col(offset_col) / budget)
    )


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    chunk_tokens: int,
    overlap: int = 0,
    joiner: str = " ",
) -> DataFrame:
    """Split each document's token array into sliding windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap`` —
    the RAG / long-context-training chunking pass. Pure expression
    work (sequence + explode + slice), map-only except the explode's
    row multiplication: no shuffle, no Python, scales linearly.

    Emits (id, chunk_no, chunk_text, n_chunk_tokens); a document with
    an empty token array emits nothing; the final window may be short
    (it is never empty — start offsets stop before the array ends).
    Deterministic, so fully oracle-checkable.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap {overlap} must be < chunk_tokens {chunk_tokens}"
        )
    step = chunk_tokens - overlap
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    n = F.size(t)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), t.alias("__t"), F.posexplode(starts).alias("chunk_no", "__s")
    )
    piece = F.slice(F.col("__t"), F.col("__s") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.array_join(piece, joiner).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )
