"""Testdata catalog: parity-safe loaders for the driver corpus.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under an
``sf_dir``.  ``load()`` returns lazy DataFrames; nothing is cached here
because at 100 TB a catalog must never materialize (callers opt into
``.cache()`` per-query when re-use warrants it).
"""

from __future__ import annotations

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
    session we didn't build; ``events`` is unreadable without
    ``nanosAsLong`` — see session.apply_runtime_conf).  After that conf,
    ``events.ts`` is epoch-nanoseconds int64.
    """
    apply_runtime_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
