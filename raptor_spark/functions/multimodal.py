"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media ride through the engine as opaque ``binary`` payloads plus typed
metadata — the layout every large multimodal pipeline uses (payload is
never parsed by Catalyst; metadata columns carry the prunable facts).
Decode / feature-extraction runs as **Arrow-batched pandas iterators**
(``mapInPandas``) so the per-item Python cost is amortized over
columnar batches and executors stream batches without materializing a
partition in memory.

The actual codec work (JPEG decode, resampling, frame sampling) needs
libraries not present in this container — those steps are STUBBED:
``decode_image`` raises ``NotImplementedError`` unless a deterministic
fake decoder is requested. Everything Spark-side — schema, batch
iteration, partitioning, output shape — is real and tested.

Media schema::

    media_id: long, media_type: string ('image'|'audio'|'video'),
    payload: binary, meta: struct<width:int, height:int, duration_ms:int>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Deterministic fake media over any text table: payload = utf-8
    bytes of the text, type cycles image/audio/video, metadata derived
    arithmetically. Gives the multimodal path real binary columns
    without shipping actual codecs into the warehouse."""
    mid = F.col(id_col).cast("long")
    n = F.length(F.col(text_col))
    return df.select(
        mid.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (mid % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            (n % 640 + 1).cast("int").alias("width"),
            (n % 480 + 1).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real codec decode — not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present; use "
        "fake_feature_batch (deterministic stand-in) for plumbing tests"
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for an embedding extractor: md5-seeded
    floats in [0,1). Same shape/dtype/batching as a real model."""
    out = []
    h = b""
    while len(out) < dim:
        h = hashlib.md5(h + payload[:64]).digest()
        out.extend(b / 255.0 for b in h)
    return out[:dim]


# resize preserves the media row shape — ONE schema definition so a
# future media-schema change cannot silently desynchronize them
RESIZED_SCHEMA = MEDIA_SCHEMA

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_w: int = 64, max_h: int = 64) -> DataFrame:
    """Resize stage plumbing: pandas batches in, same media schema out
    with updated metadata. The pixel resample itself needs PIL/opencv
    (absent here) — the deterministic stand-in clamps dimensions and
    truncates the payload proportionally, preserving the exact
    batch/schema/partitioning contract a real resampler uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            metas = []
            payloads = []
            for meta, payload in zip(pdf["meta"], pdf["payload"]):
                if (
                    meta is None
                    or payload is None
                    or meta["width"] is None
                    or meta["height"] is None
                ):
                    # NULL media passes through untouched (mirrors SQL
                    # NULL propagation); computing on it would crash
                    # the whole Arrow batch. duration_ms is NOT a gate
                    # — it is only copied, never computed on, so an
                    # image with a NULL duration still gets resized.
                    metas.append(meta)
                    payloads.append(payload)
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                scale = min(max_w / max(w, 1), max_h / max(h, 1), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                b = bytes(payload)
                n = max(int(len(b) * scale * scale), 1)
                payloads.append(b[:n])
                dur = meta["duration_ms"]
                metas.append(
                    {"width": nw, "height": nh,
                     "duration_ms": None if dur is None else int(dur)}
                )
            out["meta"] = metas
            out["payload"] = payloads
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage (video → frame rows): one output row per
    sampled timestamp — a row-expanding mapInPandas (the shape a real
    keyframe extractor has; the codec decode is the stubbed part, the
    fan-out/ordering/schema are real). Non-video rows produce no
    frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, mtype, meta, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["meta"], pdf["payload"]
            ):
                if mtype != "video":
                    continue
                if payload is None or meta is None or meta["duration_ms"] is None:
                    # NULL media: no frames — the SQL twin's
                    # generate_series(0, NULL) likewise yields none
                    continue
                dur = int(meta["duration_ms"])
                b = bytes(payload)
                for i, t in enumerate(range(0, max(dur, 1), every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(t)
                    # stand-in frame bytes: deterministic slice per ts
                    off = (t * 7) % max(len(b), 1)
                    payloads.append(b[off : off + 16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_ts_ms": pd.array(tss, dtype="int32"),
                 "payload": payloads}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over the media table.

    Batches arrive as pandas DataFrames (Arrow transfer); each yields
    one output frame — the engine-side pattern a real decode/featurize
    stage uses (swap ``_fake_feature`` for the model)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads (e.g. a NULL source text) yield NULL
            # n_bytes/digest/feature — the row survives with its id
            # and type, matching the SQL twin's NULL propagation;
            # bare .map(len) would crash the whole Arrow batch
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "feature": payloads.map(
                        lambda b: _fake_feature(bytes(b), dim)
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
