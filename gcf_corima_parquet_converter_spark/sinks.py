"""Export sinks (S7/S9/S10).

The reference's ``convert_dat_to_xsv(..., file_format=...)`` selects
CSV/TSV/Parquet output (``main.py:75-81``; the "xsv" API name), and its
parquet writer pins SNAPPY + data-page v2 + per-column encodings
(``main.py:107-119,186-194``).  Spark writes straight to the object
store (no local staging + upload step, S9 disappears), and per-column
encoding choice is delegated to parquet-mr — value-level output is
identical, encodings are chosen per column chunk.

The Hive-partitioned layout sink (S8) lives with the telemetry
operators: :func:`..operators.telemetry.write_hive_partitioned`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
