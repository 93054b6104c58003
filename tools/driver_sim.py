#!/usr/bin/env python3
"""Simulate the driver's correctness gate locally, in one command.

Builds a VANILLA SparkSession (exactly like the external driver — not
our get_spark() factory, so session-conf regressions surface here),
runs ``__spark_entry__.entry`` plus every ``queries()`` entry at the
given scale factor, and hash-compares each oracle-backed query against
its DuckDB ``oracle_sql()`` twin via tests/oracle_harness.compare
(row count + schema + value hash, with the driver's Arrow-typing
strictness).  Rows-only queries get the driver's weaker count check.

Usage:
    python3 tools/driver_sim.py [sf_dir]    # default /root/testdata/sf0.01

Exit code 0 = every query green.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from tests.oracle_harness import compare, duck_connect

    rows = entry_mod.entry(spark).collect()
    assert rows, "entry() must return >0 rows"
    print(f"entry(): {len(rows)} rows", flush=True)

    con = duck_connect(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures: list[str] = []
    for i, name in enumerate(queries):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                n = compare(queries[name](spark, sf_dir), con, oracles[name], name)
                kind = "oracle"
            else:
                n = queries[name](spark, sf_dir).count()
                kind = "rows-only"
            print(
                f"[{i + 1:2d}/{len(queries)}] {name}: {n} rows OK "
                f"({kind}, {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"[{i + 1:2d}/{len(queries)}] {name}: FAIL — {exc}", flush=True)
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print(f"\nall {len(queries)} queries green ({len(oracles)} oracle-backed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
