"""Testdata catalog: parity-safe loaders for the driver corpus.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under an
``sf_dir``.  ``load()`` returns lazy DataFrames; no DATA is ever cached
here because at 100 TB a catalog must never materialize (callers opt
into ``.cache()`` per-query when re-use warrants it).  What IS cached is
the analyzed RELATION (schema + file index) per (session, path): a bare
``spark.read.parquet`` pays a driver-side file-listing job and a footer
read on EVERY query invocation, which is exactly what a metastore
catalog exists to amortize — on object storage at 100 TB, relisting a
large prefix per query is seconds of driver latency and thousands of
LIST calls.  The corpus directories are immutable per run, matching a
metastore's snapshot semantics; anything that rewrites its own output
(e.g. ``sinks.compact_partitions``) goes through ``spark.read``
directly, not this catalog.
"""

from __future__ import annotations

from typing import Tuple

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

# (session id, sf_dir, table) -> analyzed DataFrame.  Keyed by the
# JVM-side session so a new SparkSession (fresh driver, different confs)
# never sees another session's relations.  Bounded: 10 tables x the
# handful of sf dirs a process ever touches, and entries belonging to
# STOPPED sessions are purged on the next load (a stop/recreate loop —
# test harnesses, in-process notebook restarts — must not pin dead
# sessions forever).
_RELATIONS: dict[Tuple[int, str, str], DataFrame] = {}


def _purge_stopped() -> None:
    # snapshot first (a concurrent load() may insert mid-iteration) and
    # memoize the py4j isStopped() round-trip per SESSION, not per
    # entry — a fresh session's 10 table misses would otherwise pay
    # O(tables^2) JVM calls
    stopped_by_session: dict[int, bool] = {}
    dead = []
    for key, df in list(_RELATIONS.items()):
        sid = key[0]
        if sid not in stopped_by_session:
            try:
                stopped_by_session[sid] = (
                    df.sparkSession.sparkContext._jsc.sc().isStopped()
                )
            except Exception:
                stopped_by_session[sid] = True  # unreachable: drop it
        if stopped_by_session[sid]:
            dead.append(key)
    for key in dead:
        _RELATIONS.pop(key, None)


def invalidate(sf_dir: str | None = None, table: str | None = None) -> None:
    """Drop cached relations — all of them, everything under one
    ``sf_dir``, or one (sf_dir, table).  The in-API escape hatch for a
    caller that rewrites a table path mid-session (the cache otherwise
    serves the stale file index/schema until the session ends, by the
    same snapshot semantics a metastore has until you REFRESH TABLE)."""
    for key in [
        k
        for k in _RELATIONS
        if (sf_dir is None or k[1] == sf_dir) and (table is None or k[2] == table)
    ]:
        _RELATIONS.pop(key, None)


def load(
    spark: SparkSession, sf_dir: str, table: str, refresh: bool = False
) -> DataFrame:
    """Load one corpus table.

    ``refresh=True`` bypasses and replaces this (session, path)'s cached
    relation — use after rewriting the table in place (see
    :func:`invalidate` for the bulk form).

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
    key = (id(spark._jsparkSession), sf_dir, table)
    if refresh:
        _RELATIONS.pop(key, None)
    cached = _RELATIONS.get(key)
    if cached is not None:
        return cached
    # purge on the MISS path only: isStopped() is a py4j round-trip per
    # entry, far too slow for the per-query hit path; misses are rare
    # (first touch of a table, or a fresh session — exactly when dead
    # entries can exist)
    _purge_stopped()
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") in ("timestamp", "timestamp_ntz"):
        ns = F.unix_micros(F.col("ts").cast("timestamp_ltz")) * F.lit(1000)
        df = df.withColumn("ts", ns.cast("long"))
    _RELATIONS[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
