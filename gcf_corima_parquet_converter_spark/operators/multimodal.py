"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas functions over ``mapInPandas``.

The container has no image/audio codecs, so the *decode kernels* are
stubbed: ``decode=\"fake\"`` produces deterministic pseudo-features from
the bytes (so schema/partitioning/batch plumbing is fully testable);
``decode=\"real\"`` raises NotImplementedError at the exact seam where
PIL/librosa/ffmpeg would slot in.  Everything around the stub — the
schema contract, Arrow batching, partition sizing — is real Spark.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column (stand-in for image /
    audio bytes; the engine treats it as any other BinaryType column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def payload_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Cheap metadata that never decodes: byte length + digest.

    Pure built-ins — this is the dedup / manifest path for binary
    corpora and must not invoke Python."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(bin_col)).cast("long"),
            "digest": F.md5(F.col(bin_col)),
        }
    )


def _fake_decode(payload: bytes, n_features: int) -> tuple[int, int, np.ndarray]:
    """Deterministic pseudo-decoder: dimensions and features derived
    from a sha256 of the bytes.  Replace with a real codec off-cluster."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    rng = np.frombuffer(
        hashlib.sha256(h).digest() * ((4 * n_features) // 32 + 1), dtype=np.uint8
    )[: 4 * n_features]
    feats = (rng.astype(np.float32).reshape(-1, 4).mean(axis=1) / 255.0).astype(
        np.float32
    )
    return width, height, feats


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_s", FloatType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    type_col: str = "media_type",
    decode: str = "fake",
) -> DataFrame:
    """Resize kernel over ``mapInPandas`` (1:1 rows, new payload).

    ``decode="fake"`` re-encodes deterministically (sha256-keyed bytes
    of the target size, capped) so downstream schema/size contracts are
    testable; ``decode="real"`` is the PIL/opencv seam.  The payload
    column is REPLACED — at 100 TB you write this to a new partitioned
    table, never hold both generations in one frame.
    """
    if decode == "real":
        raise NotImplementedError("real resize needs PIL/opencv; use decode='fake'")
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")
    w, h = int(width), int(height)

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[type_col].astype(str),
                    "width": np.int32(w),
                    "height": np.int32(h),
                    "payload": [
                        # deterministic stand-in for the resized encoding
                        (hashlib.sha256(bytes(p)).digest() * ((w * h) // 32 + 1))[
                            : min(w * h, 4096)
                        ]
                        for p in pdf[bin_col]
                    ],
                }
            )
            yield out

    return df.select(F.col(id_col), F.col(type_col), F.col(bin_col)).mapInPandas(
        _resize, RESIZED_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    fps: float = 1.0,
    duration_s: float = 8.0,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one input row -> ``fps * duration`` frame
    rows (the UDTF shape, U5).  ``mapInPandas`` yields arbitrary row
    counts per batch, so the fan-out needs no explode or join; frame
    timestamps are ``frame_idx / fps``.  Fake kernel: frame bytes are
    deterministic slices keyed by (payload digest, frame_idx); real
    kernel is the ffmpeg seam.
    """
    if decode == "real":
        raise NotImplementedError("real frame sampling needs ffmpeg; use decode='fake'")
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")
    n_frames = max(int(fps * duration_s), 1)

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[bin_col]):
                digest = hashlib.sha256(bytes(p)).digest()
                for i in range(n_frames):
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(i / fps)
                    payloads.append(
                        hashlib.sha256(digest + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_s": pd.Series(tss, dtype="float32"),
                    "frame_payload": payloads,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(_sample, FRAME_SCHEMA)


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    type_col: str = "media_type",
    n_features: int = 16,
    decode: str = "fake",
    batch_rows: int = 256,
) -> DataFrame:
    """Decode/feature-extract binary media via ``mapInPandas``.

    Arrow streams batches of (id, bytes) into Python; each batch is
    decoded vectorized-per-batch and yielded with MEDIA_META_SCHEMA.
    ``batch_rows`` bounds per-batch memory (decoded frames are much
    bigger than their payloads — size batches for the decoded footprint,
    not the input's).  Runs one task per input partition: repartition
    upstream so tasks stay balanced when payload sizes are skewed.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding needs PIL/librosa/ffmpeg, not present in "
            "this container; use decode='fake' for plumbing tests"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    nf = int(n_features)

    def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, mtype, payload in zip(
                    chunk[id_col], chunk[type_col], chunk[bin_col]
                ):
                    data = bytes(payload)
                    w, h, feats = _fake_decode(data, nf)
                    rows.append(
                        (
                            int(mid),
                            str(mtype),
                            len(data),
                            hashlib.md5(data).hexdigest(),
                            w,
                            h,
                            feats,
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
                )

    return df.select(
        F.col(id_col), F.col(type_col), F.col(bin_col)
    ).mapInPandas(_decode_batches, MEDIA_META_SCHEMA)
