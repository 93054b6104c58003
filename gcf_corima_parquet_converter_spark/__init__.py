"""spark_graft: a PySpark-native analytics engine with the query and
data-processing capabilities of orcio/gcf-corima-parquet-converter.

The reference (see /root/reference/main.py) is a single-threaded pandas
ETL: decode HSDatalog2 binary accelerometer acquisitions, enrich with
absolute nanosecond timestamps + device metadata, compute 1-second
tumbling-window RMS over complete windows, write Hive-partitioned
Parquet.  This package re-expresses every stage as a lazy, composable
Spark DataFrame operator, plus the LLM-data-pipeline operators
(dedup / similarity search / text analysis / multimodal plumbing) the
north star demands — all designed for 1000-executor / 100 TB scale.

Layout:
    session      SparkSession factory (AQE, Arrow, ns-parquet handling)
    catalog      testdata table loader with parity-safe schemas
    schema/      DTDL -> StructType registry + column-name sanitizer
    sources/     binary .dat decode, acquisition loader + facade, JSONL,
                 WebDataset tar shards
    operators/   telemetry (enrich+RMS), dedup, similarity, text,
                 multimodal, pipeline, sketches, scale
    sinks        CSV/TSV/JSONL export, parquet writer posture, compaction
    streaming/   Structured Streaming twin of the ingest path
    queries      the t2 corpus: named DataFrame queries + DuckDB oracle SQL

Plan evidence lives in PLANS.md (regenerate: tools/gen_plans.py); the
plan regression gate is tests/test_plan_invariants.py.
"""

__version__ = "0.1.0"
