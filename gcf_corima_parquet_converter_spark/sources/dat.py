"""HSDatalog2 ``.dat`` binary decode: framing law + distributed scan.

Framing law (reference: stdatalog_dtk/HSD_DataToolkit.py:42-72):
a packet is ``samples_per_ts * dim * sizeof(data_type)`` bytes of
interleaved samples followed by one little-endian float64 timestamp
(seconds, relative to acquisition start); ``samples_per_ts == 0`` means
no timestamps at all.  Incomplete trailing bytes are carried to the
next chunk (``incoming_data`` buffer in the reference; ``PacketFramer``
here).

Scale design: fixed packet length means any multiple of it is a clean
framing boundary, so files decode as packet-aligned BYTE RANGES — a
``mapInPandas`` kernel (numpy ``frombuffer``, zero-copy reshape) per
range, ranged reads (local seek / ``pyarrow.fs`` object-store GET),
no shuffle of sample data; parallel across acquisitions AND within a
large file (one 1-hour 96M-sample acquisition is ~10 ranges, so a
single hot file can never serialize a stage).
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


def _read_range(path: str, start: int, length: int) -> bytes:
    """Read ``length`` bytes at ``start`` from a binaryFile path URI.
    Local ``file:`` URIs use plain seek/read; anything else (gs://,
    s3://, hdfs://) goes through ``pyarrow.fs`` — the same ranged-GET
    primitive every object store serves, so a split never downloads
    the whole blob."""
    if path.startswith("file:"):
        # binaryFile path values are Hadoop URIs: special characters
        # arrive percent-encoded (space -> %20), so decode before open
        # or ranged reads fail on such filenames while the
        # whole-file path (which never round-trips through a URI)
        # works.
        from urllib.parse import unquote

        local = unquote(path[5:])
        while local.startswith("//"):
            local = local[1:]
        with open(local, "rb") as f:
            f.seek(start)
            return f.read(length)
    if "://" not in path and path.startswith("/"):
        with open(path, "rb") as f:
            f.seek(start)
            return f.read(length)
    import pyarrow.fs as pafs

    fs, rel = pafs.FileSystem.from_uri(path)
    with fs.open_input_file(rel) as f:
        f.seek(start)
        return f.read(length)


def decode_dat(
    spark: SparkSession,
    path: str,
    params: DecodeParams,
    chunk_rows: int = 262_144,
    split_bytes: int | None = 64 << 20,
) -> DataFrame:
    """Distributed ``.dat`` scan decoded over PACKET-ALIGNED byte
    ranges: packets are fixed-length (``params.packet_len``), so any
    multiple of it is a clean framing boundary — a large file splits
    into ``split_bytes``-sized ranges decoded in parallel instead of
    serializing on one whole-file task (the reference decodes one file
    per process, main.py:84-85; a 1-hour 96M-sample acquisition here
    is ~10 ranges across the cluster, and a multi-GB file can never
    bottleneck a stage).  Per-packet timestamps make every range
    self-contained; the spts==0 stampless format gets its time grid
    from the range's global packet offset instead.

    Output: relative ``Time`` (float64 s) + one double column per axis
    + ``_file`` provenance.  Downstream enrichment (sanitize/abs-time/
    alias) stays lazy on top.  ``chunk_rows`` bounds the per-yield
    Arrow batch so a range never materializes as one pandas frame.
    ``split_bytes=None`` falls back to one-task-per-file via
    binaryFile content rows (no seekable reads needed).

    The listing pass projects binaryFile's (path, length) only —
    content is never read twice; range tasks fetch their own bytes
    with ranged reads (local seek or ``pyarrow.fs`` for object
    stores).  The tiny (path, start) frame repartitions so ranges
    spread across the cluster rather than inheriting the listing's
    single task."""
    schema = decode_schema(params)
    plen = params.packet_len

    def _decode_buf(fpath, content, base_packet: int):
        samples, ts, leftover = frame_packets(content, params)
        if leftover:
            # trailing partial packet: legal mid-stream (file cut);
            # decoded rows are unaffected
            pass
        n = len(samples)
        if n == 0:
            return
        if ts.size == 0 and params.samples_per_ts == 0:
            # stampless wire format: the k/odr grid must use the
            # GLOBAL sample index, not the range-local one
            t = (
                np.arange(base_packet, base_packet + n, dtype=np.float64)
                / params.odr
            )
        else:
            t = sample_times(ts, params, n)
        for s in range(0, n, chunk_rows):
            e = min(s + chunk_rows, n)
            out = {"Time": t[s:e]}
            for d, name in enumerate(params.axis_names):
                out[name] = samples[s:e, d]
            out["_file"] = fpath
            yield pd.DataFrame(out)

    if split_bytes is None:

        def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                for fpath, content in zip(pdf["path"], pdf["content"]):
                    yield from _decode_buf(fpath, bytes(content), 0)

        return (
            spark.read.format("binaryFile")
            .load(path)
            .select("path", "content")
            .mapInPandas(_decode, schema)
        )

    per = max(int(split_bytes) // plen, 1) * plen
    files = spark.read.format("binaryFile").load(path).select("path", "length")
    ranges = (
        files.select(
            "path",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.col("length") / F.lit(per)).cast("long")
                        - F.lit(1),
                        F.lit(0),
                    ),
                )
            ).alias("_ri"),
        )
        .select("path", (F.col("_ri") * F.lit(per)).alias("_start"))
        .repartition(F.col("path"), F.col("_start"))
    )

    def _decode_ranges(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, start in zip(pdf["path"], pdf["_start"]):
                buf = _read_range(str(fpath), int(start), per)
                yield from _decode_buf(fpath, buf, int(start) // plen)

    return ranges.mapInPandas(_decode_ranges, schema)
