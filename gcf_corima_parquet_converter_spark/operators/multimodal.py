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
