"""HSDatalog2 ``.dat`` binary decode: framing law + distributed scan.

Framing law (reference: stdatalog_dtk/HSD_DataToolkit.py:42-72):
a packet is ``samples_per_ts * dim * sizeof(data_type)`` bytes of
interleaved samples followed by one little-endian float64 timestamp
(seconds, relative to acquisition start); ``samples_per_ts == 0`` means
no timestamps at all.  Incomplete trailing bytes are carried to the
next chunk (``incoming_data`` buffer in the reference; ``PacketFramer``
here).

Scale design: each ``.dat`` file is one ``binaryFile`` row decoded by a
``mapInPandas`` kernel (numpy ``frombuffer``, zero-copy reshape) — one
task per file, embarrassingly parallel across acquisitions, no shuffle.
Per-sample timestamps are derived from packet timestamps (the packet
stamp is the time of its last sample [inferred from the missing-core
converter's per-sample Time output, main.py:84-101]) so clock drift
between packets is preserved rather than assuming a perfect 1/odr grid.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

# on-wire sample dtypes (TypeConversion in the missing stdatalog_core;
# SURVEY §1.2 [inferred] int8..float64 family)
_NP_DTYPES = {
    "int8": np.int8,
    "uint8": np.uint8,
    "int16": np.int16,
    "uint16": np.uint16,
    "int32": np.int32,
    "uint32": np.uint32,
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
}


def np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(_NP_DTYPES[name])
    except KeyError:
        raise ValueError(f"unsupported .dat data_type {name!r}") from None


def type_length(name: str) -> int:
    return np_dtype(name).itemsize


@dataclass(frozen=True)
class DecodeParams:
    """Per-component decode parameters (DTDL component status,
    HSD_DataToolkit.py:45-51)."""

    dim: int = 3
    data_type: str = "int16"
    samples_per_ts: int = 64
    sensitivity: float = 1.0
    odr: float = 26667.0
    axis_names: tuple[str, ...] = ("A_x [g]", "A_y [g]", "A_z [g]")

    @property
    def packet_data_len(self) -> int:
        n = self.samples_per_ts if self.samples_per_ts else 1
        return n * self.dim * type_length(self.data_type)

    @property
    def packet_len(self) -> int:
        return self.packet_data_len + (8 if self.samples_per_ts else 0)


def frame_packets(
    buf: bytes, params: DecodeParams
) -> tuple[np.ndarray, np.ndarray, bytes]:
    """Split a byte buffer into complete packets.

    Returns ``(samples, timestamps, leftover)``: samples is
    ``(n_packets*spts, dim)`` float64 (sensitivity applied), timestamps
    is ``(n_packets,)`` float64 packet stamps (empty when spts==0, where
    each "packet" is a single sample row), leftover is the incomplete
    tail to carry into the next chunk.
    """
    plen = params.packet_len
    n = len(buf) // plen
    leftover = buf[n * plen :]
    if n == 0:
        return (
            np.empty((0, params.dim)),
            np.empty(0),
            leftover,
        )
    raw = np.frombuffer(buf[: n * plen], dtype=np.uint8).reshape(n, plen)
    data_bytes = raw[:, : params.packet_data_len]
    samples = (
        np.ascontiguousarray(data_bytes)
        .view(np_dtype(params.data_type))
        .reshape(-1, params.dim)
        .astype(np.float64)
        * params.sensitivity
    )
    if params.samples_per_ts:
        ts = np.ascontiguousarray(raw[:, params.packet_data_len :]).view("<f8").ravel()
    else:
        ts = np.empty(0)
    return samples, ts, leftover


@dataclass
class PacketFramer:
    """Stateful chunk reassembler — the streaming twin of the reference's
    ``incoming_data`` remainder-carry (HSD_DataToolkit.py:53-66).

    ``feed`` accepts arbitrary byte chunks and yields only complete
    packets; the incomplete tail survives across calls (and, in
    streaming, across micro-batches via applyInPandasWithState).
    """

    params: DecodeParams
    _buf: bytes = field(default=b"")

    def feed(self, chunk: bytes) -> tuple[np.ndarray, np.ndarray]:
        self._buf += bytes(chunk)
        samples, ts, self._buf = frame_packets(self._buf, self.params)
        return samples, ts

    @property
    def pending_bytes(self) -> int:
        return len(self._buf)


def sample_times(ts: np.ndarray, params: DecodeParams, n_samples: int) -> np.ndarray:
    """Per-sample relative times from per-packet stamps: the packet
    stamp is its LAST sample's time; earlier samples step back 1/odr.
    With spts==0 (no stamps) fall back to the k/odr grid."""
    if ts.size == 0:
        return np.arange(n_samples, dtype=np.float64) / params.odr
    spts = params.samples_per_ts
    offs = (np.arange(spts, dtype=np.float64) - (spts - 1)) / params.odr
    return (ts[:, None] + offs[None, :]).ravel()[:n_samples]


def decode_schema(params: DecodeParams) -> StructType:
    return StructType(
        [StructField("Time", DoubleType())]
        + [StructField(name, DoubleType()) for name in params.axis_names]
        + [StructField("_file", StringType())]
    )


def decode_dat(
    spark: SparkSession,
    path: str,
    params: DecodeParams,
    chunk_rows: int = 262_144,
) -> DataFrame:
    """Distributed ``.dat`` scan: binaryFile rows -> mapInPandas decode.

    Output: relative ``Time`` (float64 s) + one double column per axis
    + ``_file`` provenance.  One decode task per file; downstream
    enrichment (sanitize/abs-time/alias) stays lazy on top.
    ``chunk_rows`` bounds the per-yield Arrow batch so a 1-hour 96M-
    sample acquisition never materializes as one pandas frame.
    """
    schema = decode_schema(params)

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                samples, ts, leftover = frame_packets(bytes(content), params)
                if leftover:
                    # trailing partial packet: legal mid-stream (file cut);
                    # decoded rows are unaffected
                    pass
                n = len(samples)
                if n == 0:
                    continue
                t = sample_times(ts, params, n)
                for s in range(0, n, chunk_rows):
                    e = min(s + chunk_rows, n)
                    out = {"Time": t[s:e]}
                    for d, name in enumerate(params.axis_names):
                        out[name] = samples[s:e, d]
                    out["_file"] = fpath
                    yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_decode, schema)
    )
