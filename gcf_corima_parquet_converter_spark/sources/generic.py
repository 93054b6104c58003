"""Generic table reader/writer — one entry point over every file
format the engine speaks (parquet / ORC / CSV / TSV / JSON-lines),
with extension-based inference so callers can say "read this path".

The reference exposes exactly CSV/TSV/parquet through its converter
flag (main.py:75-81 ``file_format``); this widens the same dispatch to
the formats Spark ships natively (ORC for Hive-ecosystem interchange,
JSONL for corpus work — ``sources/jsonl.py`` remains the richer
corpus-specific path with quarantine/pruning).  Avro is NOT included:
it needs the external spark-avro package, absent here — the dispatch
raises a clear error naming it rather than half-supporting it.

Everything delegates to Spark's own readers, so predicate pushdown /
column pruning / schema enforcement behave exactly as the underlying
source implements them (parquet+ORC: full pushdown; CSV/JSON: schema
applied at parse).  Compressed inputs (``.gz``/``.zst``…) decompress
via Hadoop codecs transparently — but remember a gzip file is ONE
split: at scale prefer many moderate files over few huge ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "tsv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}

_COMPRESSION_EXTS = (".gz", ".bz2", ".zst", ".snappy", ".deflate", ".lz4")

FORMATS = ("parquet", "orc", "csv", "tsv", "json")


def infer_format(path: str) -> str:
    """Format from the file extension (compression suffixes peeled
    first); directories default to parquet (the engine's native
    layout)."""
    base = path.rstrip("/")
    name = os.path.basename(base)
    root, ext = os.path.splitext(name)
    while ext.lower() in _COMPRESSION_EXTS:
        root, ext = os.path.splitext(root)
    if not ext:
        return "parquet"
    fmt = _EXT_FORMAT.get(ext.lower())
    if fmt is None:
        if ext.lower() in (".avro",):
            raise ValueError(
                "avro needs the external spark-avro package (not bundled); "
                "convert via parquet or add the package to the session"
            )
        raise ValueError(f"cannot infer a format from {path!r} ({ext})")
    return fmt


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    header: bool = True,
    **options,
) -> DataFrame:
    """Read ``path`` in ``fmt`` (inferred from the extension when
    omitted).  ``schema`` (StructType or DDL string) is applied where
    the format supports it — ALWAYS pass one for CSV/JSON in
    production: schema inference is an extra full pass over the data
    and type-drifts between runs.
    """
    fmt = (fmt or infer_format(path)).lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    sep = None
    if fmt == "tsv":
        fmt, sep = "csv", "\t"
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", header)
        reader = reader.option("sep", sep or options.pop("sep", ","))
        if schema is None:
            reader = reader.option("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    header: bool = True,
    **options,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (inferred when omitted).
    Columnar formats default to snappy; text formats to the format's
    default.  ``partition_by`` Hive-partitions the layout (same
    contract as ``sinks.write_parquet``/S8)."""
    fmt = (fmt or infer_format(path)).lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    sep = None
    if fmt == "tsv":
        fmt, sep = "csv", "\t"
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", header)
        writer = writer.option("sep", sep or options.pop("sep", ","))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
