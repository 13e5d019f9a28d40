"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode* step is a
clearly marked stub (``decode_image_real`` raises) plus a deterministic
fake used to prove the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — end-to-end.

Scale notes: ``mapInPandas`` streams Arrow record batches through
Python, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size; binary payloads never pass through the driver; and the
feature extractor is a narrow transformation — it pipelines with the
scan and adds no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from hadoop__spark.operators.util import ensure_parallelism
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the (stubbed) feature extractor.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("mime", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)


def to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pack a text column as an opaque binary payload + typed metadata —
    the storage layout real image/audio corpora use (binary body,
    struct metadata) built from the text fixtures."""
    df = ensure_parallelism(df)
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_real(content: bytes) -> Any:
    """Real image decode — requires an imaging library not present in
    this container.  Kept as the integration point; the pipeline is
    exercised with :func:`extract_features`'s deterministic fake."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires Pillow; this environment ships none — "
            "wire decode_image_real to the real library on a full cluster"
        ) from exc
    raise NotImplementedError("real decode path is intentionally stubbed")


def extract_features(media: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-batch function is where a real decoder (PIL / ffmpeg /
    torchaudio) would run; the deterministic fake derives features from
    the raw bytes so correctness is oracle-checkable.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            # null payloads (a NULL source column upstream) report -1,
            # matching first_byte's empty convention — a bare len(None)
            # would fail the whole job with an executor-side TypeError
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else -1
                    ).astype("int64"),
                    "first_byte": content.map(
                        lambda b: int(b[0])
                        if b is not None and len(b)
                        else -1
                    ).astype("int64"),
                    "mime": pdf["meta"].map(
                        lambda m: m["mime"] if m is not None else None
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' stand-in: normalize every payload to exactly
    ``target_bytes`` (truncate or zero-pad), updating the metadata
    struct — the batch shape and schema contract of a real image
    resize (decode → scale → re-encode would replace the byte slice;
    see :func:`decode_image_real` for the integration point).

    Output schema equals the input MEDIA_SCHEMA, so resize composes
    with :func:`extract_features` / :func:`frame_sample` — resize →
    extract is one fused Arrow pass, no shuffle between them.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            # null payloads stay null with n_bytes 0 (honest metadata)
            # rather than crashing the Arrow worker on b[:target]
            out["content"] = out["content"].map(
                lambda b: bytes(b[:target_bytes]).ljust(
                    target_bytes, b"\x00"
                )
                if b is not None
                else None
            )
            out["meta"] = [
                {
                    "mime": m["mime"] if m is not None else None,
                    "n_bytes": target_bytes if b is not None else 0,
                }
                for m, b in zip(pdf["meta"], out["content"])
            ]
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the binary payload every
    ``every_n_bytes`` bytes — the same partition/batch shape a video
    frame sampler would produce (doc_id, frame_idx, frame_bytes).
    Null payloads yield zero frames (like empty ones)."""
    if every_n_bytes <= 0:
        # 0 raises 'range() arg 3 must not be zero' per-task; a
        # negative stride silently returns zero frames for EVERY doc
        raise ValueError(
            f"every_n_bytes must be positive, got {every_n_bytes}"
        )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue
                for i in range(0, len(content), every_n_bytes):
                    ids.append(int(doc_id))
                    idxs.append(i // every_n_bytes)
                    frames.append(bytes(content[i : i + every_n_bytes]))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int64"),
                 "frame": pd.Series(frames, dtype=object)}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )
    return media.mapInPandas(_sample, schema=schema)
