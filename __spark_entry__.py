"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference pipeline's tumbling-
window completeness-gated RMS shape, main.py:146-181, on the driver's
events table).  ``queries``/``oracle_sql`` expose the full t2 corpus
from gcf_corima_parquet_converter_spark.queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcf_corima_parquet_converter_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["q00_flagship_daily_rms"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(_q.ORACLE)
