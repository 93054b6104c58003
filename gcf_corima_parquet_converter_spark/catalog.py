"""Testdata catalog: parity-safe loaders for the driver corpus.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under an
``sf_dir``.  ``load()`` returns lazy DataFrames; nothing is cached here
because at 100 TB a catalog must never materialize (callers opt into
``.cache()`` per-query when re-use warrants it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one corpus table.

    Applies the runtime confs first (the correctness driver hands us a
    session we didn't build — see session.apply_runtime_conf).  The
    ``events.ts`` column is normalized to epoch-nanoseconds int64
    regardless of how the generator wrote it: parquet TIMESTAMP(NANOS)
    reads as int64 directly under ``nanosAsLong``; TIMESTAMP(MICROS)
    (plain or NTZ — the session timezone is pinned UTC so the NTZ cast
    is exact) is converted via ``unix_micros * 1000``.  Downstream
    queries and the DuckDB oracles (``epoch_us(ts)``) both see the same
    µs-exact values either way.
    """
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") in ("timestamp", "timestamp_ntz"):
        ns = F.unix_micros(F.col("ts").cast("timestamp_ltz")) * F.lit(1000)
        df = df.withColumn("ts", ns.cast("long"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
