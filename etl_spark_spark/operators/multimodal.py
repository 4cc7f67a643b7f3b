"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; all
heavy per-item work (decode, resize, frame-sample, feature-extract)
runs as Arrow-batched pandas iterators via ``mapInPandas`` — the Spark
side (schema, partitioning, batch shape) is real and tested, while the
actual codec calls are stubbed: this container has no image/audio
libraries, so ``decode_media`` raises NotImplementedError unless the
deterministic fake decoder is selected (used by tests and fixtures).

At scale: binary payloads stay columnar in parquet; mapInPandas
processes whole Arrow batches per task, so per-item Python overhead is
amortized; ``repartition`` by size-bucket before decode balances skewed
media sizes across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, media_size long"
)

FEATURE_SCHEMA = (
    "id long, media_type string, n_bytes long, checksum string, "
    "feat array<double>"
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an existing column as an opaque media payload with typed
    metadata (the ingestion shape for image/audio/video tables)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        payload.alias("media"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("media_size"),
    )


def _fake_decode(payload: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic stand-in for a codec: fixed-length feature vector
    from byte statistics (stable across runs/executors)."""
    if not payload:
        return [0.0] * n_feat
    return [
        float(sum(payload[i::n_feat]) % 997) / 997.0 for i in range(n_feat)
    ]


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real media decoding requires image/audio codecs not present in "
        "this environment; pass fake=True for the deterministic test path"
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-item feature extraction over media rows via mapInPandas
    (Arrow-batched; one Python worker per task, whole-batch amortized)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(m if m is not None else b"", t, fake=fake)
                for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(m) if m is not None else 0 for m in pdf["media"]],
                    "checksum": [
                        hashlib.md5(m if m is not None else b"").hexdigest()
                        for m in pdf["media"]
                    ],
                    "feat": feats,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
