"""Export sinks (S7/S9/S10).

The reference's ``convert_dat_to_xsv(..., file_format=...)`` selects
CSV/TSV/Parquet output (``main.py:75-81``; the "xsv" API name), and its
parquet writer pins SNAPPY + data-page v2 + per-column encodings
(``main.py:107-119,186-194``).  Spark writes straight to the object
store (no local staging + upload step, S9 disappears), and per-column
encoding choice is delegated to parquet-mr — value-level output is
identical, encodings are chosen per column chunk.  Consumers that
byte-diff files against the reference get the opt-in
:func:`write_parquet_pinned` (r12): a distributed pyarrow final stage
that pins the reference's exact per-column encodings.

The Hive-partitioned layout sink (S8) lives with the telemetry
operators: :func:`..operators.telemetry.write_hive_partitioned`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: file_format values accepted by the reference's converter [inferred
#: from the API name "xsv" + the file_format="PARQUET" call site]
_SEPARATORS = {"CSV": ",", "TSV": "\t"}


def write_xsv(
    df: DataFrame,
    path: str,
    file_format: str = "CSV",
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """CSV/TSV export (S10).

    ``single_file`` coalesces to one output part — ONLY for small
    exports (it serializes the write through one task); the default
    keeps one file per partition, which is what a 100 TB export needs.
    """
    sep = _SEPARATORS.get(file_format.upper())
    if sep is None:
        raise ValueError(f"file_format must be CSV or TSV, got {file_format!r}")
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).option(
        "sep", sep
    ).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    mode: str = "overwrite",
    keep_nulls: bool = False,
    records_per_file: int | None = None,
) -> None:
    """JSON-Lines export (LLM-corpus interchange; pairs with
    ``sources.jsonl.read_jsonl``).

    One JSON object per line, one shard per partition (compressed
    shards are the unit of parallelism for the next reader — never
    coalesce a corpus export to one file).  ``keep_nulls`` emits
    explicit ``"field": null`` instead of omitting the key — some
    downstream loaders distinguish the two.  ``records_per_file``
    bounds shard size so a skewed partition can't produce one huge
    shard (gzip shards are NOT splittable: an unbounded shard is a
    straggler for every future scan).
    """
    w = df.write.mode(mode).option("compression", compression)
    if keep_nulls:
        w = w.option("ignoreNullFields", "false")
    if records_per_file is not None:
        w = w.option("maxRecordsPerFile", records_per_file)
    w.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    mode: str = "overwrite",
    page_version: str = "v2",
    sort_by: list[str] | None = None,
) -> None:
    """Plain parquet sink with the reference's writer posture (S7):
    SNAPPY, data-page v2, dictionary encoding on (parquet-mr default).
    ``sort_by`` sorts within partitions (no extra shuffle) so sorted
    int64 columns (Time) get delta encoding from the v2 writer, matching
    the reference's explicit DELTA_BINARY_PACKED choice for Time.
    """
    out = df.sortWithinPartitions(*sort_by) if sort_by else df
    (
        out.write.mode(mode)
        .option("compression", compression)
        .option("parquet.writer.version", page_version)
        .parquet(path)
    )


def write_parquet_pinned(
    df: DataFrame,
    path: str,
    column_encodings: dict[str, str] | None = None,
    dictionary_cols: list[str] | None = None,
    compression: str = "snappy",
    sort_by: list[str] | None = None,
    overwrite: bool = True,
) -> dict:
    """Opt-in BYTE-PARITY parquet sink (S7's last gap): pins PER-COLUMN
    encodings exactly like the reference's pyarrow writer —
    ``Time → DELTA_BINARY_PACKED`` + dictionary ``alias``
    (/root/reference/main.py:107-119) — which Spark's parquet-mr writer
    cannot express (it picks encodings per column chunk itself;
    :func:`write_parquet` gets EQUIVALENT encodings via v2 pages +
    sorted writes, and that is the default sink).  Reach for this one
    only when a downstream consumer byte-diffs files against the
    reference's output.

    Distributed: each Spark partition streams its Arrow batches into
    ONE pyarrow ``ParquetWriter`` via ``mapInPandas`` — no driver
    collect, no single-writer funnel; files land as
    ``part-<partition>-<uuid>.parquet`` plus a ``_SUCCESS`` marker.
    Defaults mirror the reference: snappy, data-page v2,
    ``column_encodings={"Time": "DELTA_BINARY_PACKED"}``,
    ``dictionary_cols=["alias"]`` (each applied only when the column
    exists).  Local-path sink (the reference's staging contract);
    object-store consumers should use :func:`write_parquet`.
    """
    import os
    import shutil
    import uuid

    from pyspark.sql.pandas.types import to_arrow_schema

    if column_encodings is None:
        # Default only when Time is integral: the reference pins
        # DELTA_BINARY_PACKED *after* converting Time to int64 ns
        # (main.py:101-119); on a raw float64-seconds frame pyarrow
        # would fail executor-side ("DELTA_BINARY_PACKED encoder only
        # supports INT32 and INT64"), so a float Time falls back to {}.
        time_integral = any(
            f.name == "Time" and isinstance(f.dataType, (T.LongType, T.IntegerType))
            for f in df.schema.fields
        )
        column_encodings = {"Time": "DELTA_BINARY_PACKED"} if time_integral else {}
    else:
        for col, encoding in column_encodings.items():
            if encoding.upper() == "DELTA_BINARY_PACKED":
                dt = dict(zip(df.columns, [f.dataType for f in df.schema.fields])).get(col)
                # Valid on any type Arrow stores as parquet physical
                # INT32/INT64: byte/short widen to INT32, date is
                # INT32 days, timestamp is INT64 µs/ns — not just
                # int/long.
                ok_types = (
                    T.LongType,
                    T.IntegerType,
                    T.ShortType,
                    T.ByteType,
                    T.DateType,
                    T.TimestampType,
                    T.TimestampNTZType,
                )
                if dt is not None and not isinstance(dt, ok_types):
                    raise ValueError(
                        f"column_encodings[{col!r}] = DELTA_BINARY_PACKED requires a "
                        f"column with parquet physical INT32/INT64 (byte/short/int/"
                        f"long/date/timestamp); {col!r} is {dt.simpleString()} — cast "
                        "it first (the reference converts Time to int64 ns before "
                        "pinning, main.py:101-119)"
                    )
    if dictionary_cols is None:
        dictionary_cols = ["alias"] if "alias" in df.columns else []
    missing = [
        c
        for c in list(column_encodings) + list(dictionary_cols)
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"pinned columns not in frame: {missing}")
    arrow_schema = to_arrow_schema(df.schema)
    out = df.sortWithinPartitions(*sort_by) if sort_by else df
    if overwrite and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    enc = dict(column_encodings)
    dcols = list(dictionary_cols)
    run_id = uuid.uuid4().hex[:12]

    def _write(it):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        writer, n = None, 0
        fname = os.path.join(path, f"part-{pid:05d}-{run_id}.parquet")
        for pdf in it:
            if not len(pdf):
                continue
            batch = pa.Table.from_pandas(
                pdf, schema=arrow_schema, preserve_index=False
            )
            if writer is None:
                writer = pq.ParquetWriter(
                    fname,
                    arrow_schema,
                    compression=compression,
                    data_page_version="2.0",
                    use_dictionary=dcols,
                    column_encoding=enc,
                )
            writer.write_table(batch)
            n += len(pdf)
        if writer is not None:
            writer.close()
            yield pd.DataFrame({"file": [fname], "rows": [n]})

    report = out.mapInPandas(_write, "file string, rows long").collect()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return {
        "files": len(report),
        "rows": int(sum(r["rows"] for r in report)),
        "path": path,
    }


def compact_partitions(
    spark,
    root: str,
    partition_cols: list[str],
    target_records_per_file: int = 5_000_000,
    sort_within: list[str] | None = None,
) -> int:
    """Small-file compaction for a Hive-partitioned table (the
    operational tail of S8: a per-acquisition writer — or a streaming
    sink — leaves many tiny files per partition; readers then pay one
    task+open per file).

    Rewrites each partition's files into ceil(rows/target) files via a
    single distributed job: read -> repartition ON THE PARTITION KEYS
    (so each output partition's rows co-locate, one writer task per
    partition instead of every task writing to every partition) ->
    STAGE under ``root/_compact_tmp_*`` (underscore prefix: invisible
    to parquet readers of ``root`` while in flight) -> swap each
    rewritten partition directory into place with filesystem renames.
    Never read-from-and-overwrite the same prefix in one job — that
    depends on commit-protocol ordering and corrupts on object stores
    whose "rename" is copy+delete mid-scan.  ``sort_within`` re-sorts
    rows inside each rewritten file so delta encoding survives
    compaction.  Returns the number of rows rewritten (counted from
    the staged output's parquet footers — a metadata-only scan, not a
    second pass over the data).

    At 100 TB: run per-partition-subset (pass a root with partition
    predicates pushed, e.g. ``.../year=2025/month=7``) so one
    compaction job never rewrites the whole table.
    """
    import uuid

    df = spark.read.parquet(root)
    out = df.repartition(*partition_cols)
    if sort_within:
        out = out.sortWithinPartitions(*partition_cols, *sort_within)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    root_path = HPath(root)
    fs = root_path.getFileSystem(hconf)
    tmp = HPath(root_path, "_compact_tmp_" + uuid.uuid4().hex)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(tmp.toString())
    )
    try:
        n = spark.read.parquet(tmp.toString()).count()

        # build the partition-relative path from directory NAMES, not
        # string slicing — listStatus returns scheme-qualified paths
        # (file:/..., gs://...) that don't prefix-match the input string
        def _leaf_dirs(path, depth, rel=()):
            if depth == 0:
                yield path, "/".join(rel)
                return
            for st in fs.listStatus(path):
                name = st.getPath().getName()
                if st.isDirectory() and "=" in name:
                    yield from _leaf_dirs(
                        st.getPath(), depth - 1, rel + (name,)
                    )

        # Swap each partition in with a rename-aside recovery path:
        # Hadoop rename() reports failure as a FALSE RETURN, not an
        # exception, so an unchecked rename after deleting the live
        # directory would silently lose the partition.  Instead the old
        # directory is renamed aside (under the staging prefix), the
        # staged one renamed in, and only then is the old copy deleted;
        # any failed step restores the aside copy and raises WITHOUT
        # cleaning the staging prefix, so both the old data and the
        # staged rewrite survive for recovery.
        for src, rel in _leaf_dirs(tmp, len(partition_cols)):
            dst = HPath(root_path, rel)
            bak = None
            if fs.exists(dst):
                bak = HPath(tmp, "_bak_" + rel.replace("/", "_"))
                if not fs.rename(dst, bak):
                    raise RuntimeError(
                        f"compact_partitions: could not move {dst} aside; "
                        f"table untouched, staged rewrite kept at {tmp}"
                    )
            fs.mkdirs(dst.getParent())
            if not fs.rename(src, dst):
                if bak is not None:
                    fs.rename(bak, dst)
                raise RuntimeError(
                    f"compact_partitions: rename {src} -> {dst} failed; "
                    f"old partition restored, staged rewrite kept at {tmp}"
                )
            if bak is not None:
                fs.delete(bak, True)
    except BaseException:
        # keep the staging prefix: it holds the rewrite (and any moved-
        # aside originals) — the underscore prefix keeps readers blind
        # to it, and a rerun stages under a fresh uuid.
        raise
    else:
        fs.delete(tmp, True)
    return n
