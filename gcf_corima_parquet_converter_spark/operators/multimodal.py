"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas functions over ``mapInPandas``.

Decode kernels come in three modes:

* ``decode="fake"`` — deterministic pseudo-features from the bytes
  (schema/partitioning/batch plumbing fully testable with no codecs);
* ``decode="real"`` — a REAL Pillow kernel (image open/resize/
  feature-extract) behind an optional import: raises
  NotImplementedError with an install hint when Pillow is absent;
* ``decode="auto"`` — real when Pillow imports, fake otherwise (the
  graceful-fallback mode for heterogeneous clusters / CI).

Audio is REAL with no extra dependency: ``decode_audio`` parses WAV
via the stdlib ``wave`` module and raw PCM16 directly (the IMP34DT05
microphone wire format), ``resample_pcm``/``encode_pcm`` complete the
decode -> resample -> features path.  Video codecs (ffmpeg) stay an
honest NotImplementedError seam — ``sample_frames`` documents where
ffmpeg slots in.  Everything around the kernels — the schema contract,
Arrow batching, partition sizing — is real Spark either way.
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


def _pil():
    """Optional-import gate for the real image kernels (None if Pillow
    is not installed — executors and driver share the environment)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _resolve_decode(decode: str, needs: str = "Pillow") -> str:
    """'auto' -> 'real' iff Pillow imports; 'real' without Pillow is an
    explicit NotImplementedError (the honest capability seam)."""
    if decode == "auto":
        return "real" if _pil() is not None else "fake"
    if decode == "real" and _pil() is None:
        raise NotImplementedError(
            f"decode='real' needs {needs} (pip install pillow), which is "
            "not present; decode='auto' falls back to the fake kernel"
        )
    if decode not in ("real", "fake"):
        raise ValueError(f"unknown decode mode {decode!r}")
    return decode


def _real_image_decode(
    payload: bytes, n_features: int
) -> tuple[int, int, np.ndarray]:
    """Pillow kernel: true dimensions + a grayscale thumbnail feature
    vector (n_features values in [0,1], resampled row-major)."""
    import io

    img = _pil().open(io.BytesIO(payload))
    width, height = img.size
    side = max(int(np.ceil(np.sqrt(n_features))), 1)
    small = np.asarray(
        img.convert("L").resize((side, side)), dtype=np.float32
    ).ravel()[:n_features]
    return width, height, (small / 255.0).astype(np.float32)


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
    testable; ``decode="real"`` is a Pillow open->resize->PNG kernel
    (optional import; ``decode="auto"`` falls back to fake).  The
    payload column is REPLACED — at 100 TB you write this to a new
    partitioned table, never hold both generations in one frame.
    """
    decode = _resolve_decode(decode)
    w, h = int(width), int(height)

    def _resize_real_one(p: bytes) -> bytes:
        import io

        img = _pil().open(io.BytesIO(bytes(p)))
        buf = io.BytesIO()
        img.resize((w, h)).save(buf, format="PNG")
        return buf.getvalue()

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                payloads = [_resize_real_one(p) for p in pdf[bin_col]]
            else:
                payloads = [
                    # deterministic stand-in for the resized encoding
                    (hashlib.sha256(bytes(p)).digest() * ((w * h) // 32 + 1))[
                        : min(w * h, 4096)
                    ]
                    for p in pdf[bin_col]
                ]
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[type_col].astype(str),
                    "width": np.int32(w),
                    "height": np.int32(h),
                    "payload": payloads,
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
    if decode in ("real", "auto"):
        # video decoding needs ffmpeg, which has no pure-Python fallback:
        # this stays an honest capability seam (unlike the Pillow-backed
        # image kernels, 'auto' cannot silently degrade a frame SAMPLER
        # to fake frames without corrupting downstream training data).
        raise NotImplementedError(
            "real frame sampling needs ffmpeg (not installed); use "
            "decode='fake' for plumbing tests"
        )
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
    decode = _resolve_decode(decode)
    nf = int(n_features)
    kernel = _real_image_decode if decode == "real" else _fake_decode

    def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, mtype, payload in zip(
                    chunk[id_col], chunk[type_col], chunk[bin_col]
                ):
                    data = bytes(payload)
                    w, h, feats = kernel(data, nf)
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


# -------------------------------------------------------------- audio
# PCM/WAV decode needs only the stdlib (``wave`` + numpy), so unlike the
# Pillow image kernels the REAL audio path is always available; "fake"
# remains for pure-plumbing tests.  The producing end of this column is
# the IMP34DT05 microphone board (schema/templates.py: dim=1 int16 PCM
# at 16/32/48 kHz, sensitivity 1/32768): decode its .dat stream with the
# telemetry path, then ``encode_pcm`` packs the per-acquisition waveform
# into one payload per id — the multimodal audio column end-to-end.

AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", FloatType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _pcm16_to_float(raw: bytes, n_channels: int) -> np.ndarray:
    """int16 LE bytes -> mono float32 in [-1, 1) (channels averaged —
    the level/feature convention; keep channels upstream if you need
    them separately)."""
    raw = raw[: (len(raw) // 2) * 2]  # tolerate a trailing odd byte
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_channels > 1:
        x = x[: (len(x) // n_channels) * n_channels].reshape(
            -1, n_channels
        ).mean(axis=1)
    return x


def _windowed_rms(x: np.ndarray, n_features: int) -> np.ndarray:
    """RMS level per window, n_features windows spanning the waveform —
    the audio twin of the image thumbnail features (values in [0, 1])."""
    if len(x) == 0:
        return np.zeros(n_features, dtype=np.float32)
    feats = np.array(
        [
            np.sqrt(np.mean(np.square(w))) if len(w) else 0.0
            for w in np.array_split(x, n_features)
        ],
        dtype=np.float32,
    )
    return np.clip(feats, 0.0, 1.0)


def _real_audio_decode(
    payload: bytes, n_features: int, default_rate: int, default_channels: int
) -> tuple[int, int, int, np.ndarray]:
    """stdlib-``wave`` kernel: RIFF/WAVE payloads are parsed by the
    container (rate/channels/width from the header); anything else is
    treated as headerless PCM16 LE at the caller's defaults — the wire
    format the IMP34DT05 datalog firmware emits."""
    import io
    import wave

    if payload[:4] == b"RIFF":
        with wave.open(io.BytesIO(payload)) as w:
            rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
            if width != 2:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV is supported (got {8 * width}-bit)"
                )
            raw = w.readframes(w.getnframes())
    else:
        rate, nch, raw = int(default_rate), int(default_channels), payload
    x = _pcm16_to_float(raw, nch)
    return rate, nch, len(x), _windowed_rms(x, n_features)


def _fake_audio_decode(
    payload: bytes, n_features: int, default_rate: int, default_channels: int
) -> tuple[int, int, int, np.ndarray]:
    """Deterministic pseudo-decoder keyed by the bytes (plumbing tests
    with no waveform semantics)."""
    h = hashlib.sha256(payload).digest()
    rate = (8, 16, 32, 48)[h[0] % 4] * 1000
    n_samples = 1000 + int.from_bytes(h[1:3], "little") % 64_000
    _, _, feats = _fake_decode(payload, n_features)
    return rate, 1, n_samples, feats


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    type_col: str = "media_type",
    n_features: int = 16,
    sample_rate: int = 16_000,
    n_channels: int = 1,
    decode: str = "real",
    batch_rows: int = 256,
) -> DataFrame:
    """Decode audio payloads (WAV or raw PCM16) to typed metadata +
    windowed-RMS features via ``mapInPandas`` — the audio member of
    :func:`decode_media`'s family.

    ``sample_rate``/``n_channels`` describe HEADERLESS payloads only
    (WAV headers win).  The real kernel is stdlib-only, so unlike the
    image path there is no optional-import fallback: ``decode`` is
    "real" (default) or "fake".
    """
    if decode not in ("real", "fake"):
        raise ValueError(f"unknown decode mode {decode!r}")
    kernel = _real_audio_decode if decode == "real" else _fake_audio_decode
    nf, rate0, nch0 = int(n_features), int(sample_rate), int(n_channels)

    def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, mtype, payload in zip(
                    chunk[id_col], chunk[type_col], chunk[bin_col]
                ):
                    if payload is None:
                        # null payload -> null metadata row (keeps the
                        # id; same contract as perceptual_hash)
                        rows.append(
                            (int(mid), str(mtype), None, None, None, None,
                             None, None, None)
                        )
                        continue
                    data = bytes(payload)
                    rate, nch, n, feats = kernel(data, nf, rate0, nch0)
                    rows.append(
                        (
                            int(mid),
                            str(mtype),
                            len(data),
                            hashlib.md5(data).hexdigest(),
                            rate,
                            nch,
                            n,
                            float(n) / rate if rate else 0.0,
                            feats,
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
                )

    return df.select(
        F.col(id_col), F.col(type_col), F.col(bin_col)
    ).mapInPandas(_decode_batches, AUDIO_META_SCHEMA)


RESAMPLED_AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resample_pcm(
    df: DataFrame,
    src_rate: int,
    dst_rate: int,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Linear-interpolation resample of raw PCM16-mono payloads (1:1
    rows, payload replaced) — e.g. 48 kHz microphone capture down to a
    16 kHz model rate.  Plain linear interp (no anti-alias filter):
    adequate for downsampling speech-band content and dependency-free;
    swap a polyphase kernel in here when scipy is available.
    """
    src, dst = int(src_rate), int(dst_rate)
    if src <= 0 or dst <= 0:
        raise ValueError("rates must be positive")

    def _resample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ns, payloads = [], [], []
            for mid, p in zip(pdf[id_col], pdf[bin_col]):
                if p is None:
                    ids.append(int(mid))
                    ns.append(None)
                    payloads.append(None)
                    continue
                x = np.frombuffer(bytes(p), dtype="<i2").astype(np.float64)
                n_out = int(round(len(x) * dst / src))
                if len(x) == 0 or n_out == 0:
                    out = b""
                    n_out = 0
                else:
                    pos = np.arange(n_out) * (src / dst)
                    y = np.interp(pos, np.arange(len(x)), x)
                    out = (
                        np.clip(np.rint(y), -32768, 32767)
                        .astype("<i2")
                        .tobytes()
                    )
                ids.append(int(mid))
                ns.append(n_out)
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": np.int32(dst),
                    # nullable Int64: null payloads carry null counts
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "payload": payloads,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _resample, RESAMPLED_AUDIO_SCHEMA
    )


def encode_pcm(
    df: DataFrame,
    id_col: str = "acq_id",
    time_col: str = "Time",
    value_col: str = "value",
) -> DataFrame:
    """Pack per-id sample ROWS (float in [-1, 1), the telemetry decode
    convention) into one PCM16 payload per id, ordered by ``time_col``
    — the bridge from the IMP34DT05 .dat stream to the audio column.

    ``applyInPandas`` over groupBy(id): one shuffle keyed by id; each
    payload materializes on ONE task, so ids must be acquisition-sized
    (a 60 s 48 kHz capture is ~5.8 MB — fine; don't key by day).
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def _pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values(time_col)[value_col].to_numpy(dtype=np.float64)
        pcm = (
            np.clip(np.rint(x * 32768.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
        return pd.DataFrame(
            {"media_id": [int(key[0])], "n_samples": [len(x)], "payload": [pcm]}
        )

    return (
        df.select(F.col(id_col), F.col(time_col), F.col(value_col))
        .groupBy(id_col)
        .applyInPandas(_pack, out_schema)
    )


# ------------------------------------------------------ perceptual hash


def _real_dhash(payload: bytes) -> int:
    """dHash kernel (difference hash, 64-bit): grayscale -> 9x8 resize
    -> horizontal gradient sign bits.  Robust to re-encode/resize/mild
    edits — the standard cheap image near-dup signature."""
    import io

    img = _pil().open(io.BytesIO(payload))
    px = np.asarray(img.convert("L").resize((9, 8)), dtype=np.int16)
    bits = (px[:, 1:] > px[:, :-1]).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= 1 << 63 else val


def _fake_dhash(payload: bytes) -> int:
    """Deterministic stand-in (first 8 md5 bytes as signed i64) so the
    plumbing — schema, batching, the Hamming chunk join — is testable
    without codecs.  NOT perceptual: any byte change re-deals all bits."""
    val = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return val - (1 << 64) if val >= 1 << 63 else val


def perceptual_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decode: str = "auto",
    out_col: str = "phash",
) -> DataFrame:
    """64-bit perceptual (difference) hash per image payload →
    ``(id, phash)`` — the image member of the dedup family: exact dedup
    catches byte-identical files; this catches re-encoded / resized /
    lightly-edited copies, which is what image corpora are actually
    full of.

    One Arrow-batched scalar UDF (the codec is the unavoidable Python,
    same contract as ``decode_media``); the downstream candidate join
    (:func:`phash_near_dup_pairs`) is pure JVM.  Null payloads hash to
    null.
    """
    mode = _resolve_decode(decode)
    kernel = _real_dhash if mode == "real" else _fake_dhash

    @F.pandas_udf("long")
    def _hash(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda p: None if p is None else kernel(bytes(p))
        )

    return df.select(F.col(id_col), _hash(F.col(bin_col)).alias(out_col))


def phash_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs: Hamming distance <= ``max_hamming`` between
    perceptual hashes, found with the same 16-bit-chunk pigeonhole join
    as SimHash (complete for Hamming <= 3: four chunks, at most three
    differing bits, so some chunk matches exactly — never an all-pairs
    join).  ``max_hamming`` > 3 still filters correctly but recall is
    no longer guaranteed by the pigeonhole; raise chunks, not the
    threshold, if that regime matters.
    """
    from .dedup import simhash_candidate_pairs

    sigs = hashed.select(F.col(id_col), F.col(hash_col).alias("simhash"))
    pairs = simhash_candidate_pairs(sigs, id_col)
    return pairs.where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
