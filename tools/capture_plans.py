#!/usr/bin/env python3
"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python3 tools/capture_plans.py <tag> [query ...]
       (no query args = every declared query)

Writes plans/<tag>/<query>_<suffix>.txt where suffix is the second CLI
token when it is 'before' or 'after' (default 'before').  Planning only
— no query executes except the driver-side artifact builds some query
constructors perform (run at sf0.01 to keep those cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r18"
    suffix = "before"
    names = sys.argv[2:]
    if names and names[0] in ("before", "after"):
        suffix = names[0]
        names = names[1:]

    from gcf_corima_parquet_converter_spark.session import get_spark
    from gcf_corima_parquet_converter_spark import queries as Q

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    targets = names or list(Q.QUERIES)
    failures = []
    for name in targets:
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"{name}: FAIL — {exc}", flush=True)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)}B, {n_ex} Exchange -> {path}", flush=True)
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
