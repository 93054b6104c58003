"""JSON-Lines corpus source (LLM-pipeline interchange; no reference twin).

Web-scale text corpora (Common Crawl derivatives, Dolma, RedPajama, …)
ship as gz/zstd-compressed ``.jsonl`` shards — one JSON document per
line.  The scan itself is Spark's built-in json source (JVM Jackson
parser, splittable per file, parallel across shards); this wrapper pins
the two things that matter at 100 TB:

* **No schema inference.**  ``spark.read.json`` without a schema runs a
  FULL extra pass over the data just to guess types — at corpus scale
  that doubles the job.  ``schema`` is therefore required.
* **Quarantine, don't crash.**  Real crawls contain truncated lines and
  invalid UTF-8; a million-shard job must not die on row 10^12.  With
  ``corrupt_col`` set, malformed lines land intact in that column
  (PERMISSIVE mode) so they can be counted/audited/reprocessed; without
  it, ``mode`` picks DROPMALFORMED (silently skip) or FAILFAST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str | None = None,
    mode: str = "DROPMALFORMED",
) -> DataFrame:
    """Scan ``.jsonl[.gz|.zst]`` shards with an explicit schema.

    Compression is auto-detected per file from the extension, and
    column pruning pushes into the Jackson parser (unreferenced JSON
    fields are never materialized), so ``read_jsonl(...).select("text")``
    parses only the ``text`` field of each line.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    reader = spark.read
    if corrupt_col is not None:
        schema = StructType(
            [*schema.fields, StructField(corrupt_col, StringType(), True)]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    else:
        reader = reader.option("mode", mode)
    return reader.schema(schema).json(path)


def corrupt_line_audit(df: DataFrame, corrupt_col: str) -> DataFrame:
    """One-row corruption report for a ``read_jsonl(..., corrupt_col=)``
    scan: total lines, malformed lines, malformed fraction.  Runs as a
    single partial-aggregable pass — the audit every ingest job should
    emit before the corpus is trusted downstream.

    Spark refuses queries whose referenced columns are ONLY the corrupt
    record column (SPARK-24208: such a scan could skip parsing entirely
    and report nothing malformed), so the audit also counts the first
    data column — which both satisfies the analyzer and reports how many
    lines parsed that field.
    """
    bad = F.col(corrupt_col).isNotNull().cast("long")
    data_cols = [c for c in df.columns if c != corrupt_col]
    if not data_cols:
        raise ValueError("corrupt_line_audit needs at least one data column")
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(bad).alias("n_malformed"),
        (F.sum(bad) / F.count(F.lit(1))).alias("malformed_frac"),
        F.count(F.col(data_cols[0])).alias("n_first_field_parsed"),
    )
