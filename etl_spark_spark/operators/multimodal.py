"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; all
heavy per-item work (decode, resize, frame-sample, feature-extract)
runs as Arrow-batched pandas iterators via ``mapInPandas`` — the Spark
side (schema, partitioning, batch shape) is real and tested, while the
actual codec calls are INJECTED: every stage accepts a caller-supplied
callable (``decoder`` / ``resizer`` / ``sampler``), so a real PIL/av
codec drops in at deployment without touching engine code. The
callable is pickled into the mapInPandas closure — it must be a
module-level function (standard Spark UDF closure rules). With no
injection, this container has no image/audio libraries, so
``decode_media`` raises NotImplementedError unless the deterministic
fake decoder is selected (used by tests and fixtures).

At scale: binary payloads stay columnar in parquet; mapInPandas
processes whole Arrow batches per task, so per-item Python overhead is
amortized; ``repartition`` by size-bucket before decode balances skewed
media sizes across executors.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

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


def decode_media(
    payload: bytes,
    media_type: str,
    fake: bool = False,
    decoder: Callable[[bytes, str], list[float]] | None = None,
):
    """Decode one payload to a feature vector. Precedence: an injected
    ``decoder(payload, media_type)`` wins; else the deterministic fake;
    else raise loudly (no codecs ship in this environment)."""
    if decoder is not None:
        return decoder(payload, media_type)
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real media decoding requires image/audio codecs not present in "
        "this environment; inject decoder= or pass fake=True for the "
        "deterministic test path"
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = True,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image-resize stage: same media schema out, payload replaced by
    the resized rendition plus rendition metadata. Inject a real codec
    via ``resizer(payload, width, height) -> bytes`` (a module-level
    function wrapping e.g. PIL); without injection the fake path
    deterministically truncates/pads the payload to width*height bytes
    so downstream schema/size logic is exercised for real."""
    from collections.abc import Iterator

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows = []
        for pdf in it:
            payloads = []
            for m in pdf["media"]:
                if resizer is not None:
                    payloads.append(resizer(m or b"", width, height))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image resize requires an imaging library; "
                        "inject resizer= or pass fake=True for the "
                        "deterministic test path"
                    )
                m = m or b"\x00"  # empty payload -> zero-filled rendition
                payloads.append((m * (target // len(m) + 1))[:target])
            out = pdf.copy()
            out["media"] = payloads
            out["media_size"] = [len(p) for p in payloads]
            out["width"] = width
            out["height"] = height
            out_rows.append(out)
        yield from out_rows

    return df.mapInPandas(
        batches, schema=MEDIA_SCHEMA + ", width int, height int"
    )


def sample_frames(
    df: DataFrame,
    n_frames: int,
    frame_bytes: int = 64,
    fake: bool = True,
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame-sampling stage: one output row per sampled frame
    (id, frame_no, frame binary). Inject a real codec via
    ``sampler(payload, n_frames) -> list[bytes]`` (module-level
    function wrapping e.g. av); without injection the fake path evenly
    strides the payload — the UDTF-ish 1-to-N row shape matters."""
    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frame_nos, frames = [], [], []
            for i, m in zip(pdf["id"], pdf["media"]):
                if sampler is not None:
                    for f, fr in enumerate(sampler(m or b"", n_frames)):
                        ids.append(i)
                        frame_nos.append(f)
                        frames.append(fr)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real frame sampling requires a video codec; "
                        "inject sampler= or pass fake=True for the "
                        "deterministic test path"
                    )
                m = m or b""
                stride = max(len(m) // max(n_frames, 1), 1)
                for f in range(n_frames):
                    start = f * stride
                    ids.append(i)
                    frame_nos.append(f)
                    frames.append(m[start : start + frame_bytes])
            yield pd.DataFrame(
                {"id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return df.mapInPandas(
        batches, schema="id long, frame_no int, frame binary"
    )


def extract_features(
    df: DataFrame,
    fake: bool = True,
    decoder: Callable[[bytes, str], list[float]] | None = None,
) -> DataFrame:
    """Per-item feature extraction over media rows via mapInPandas
    (Arrow-batched; one Python worker per task, whole-batch amortized).
    Inject a real codec via ``decoder(payload, media_type) ->
    list[float]`` — must be a module-level function so the closure
    pickles to executors; feature width is free (output schema is
    ``array<double>``)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(
                    m if m is not None else b"", t, fake=fake,
                    decoder=decoder,
                )
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
