"""One side of the serving A/B (r17 verdict #1): run the serving and
facade_full benches from ONE source tree (cwd / PYTHONPATH decide which)
and emit a JSON line.

Invoked by tools/ab_serving.py as a subprocess with cwd set to either
the HEAD checkout or a worktree pinned at the comparison commit, so the
same probe body measures both code states on the same host-day.  Canary
and loadavg are sampled per PROBE (before/after serving, before/after
facade), not once per run — the r17 lesson: a run-level canary could
not say which rows of a long session ran degraded.
"""

import json
import os
import sys
import time


def main() -> None:
    tree = os.getcwd()
    sys.path.insert(0, tree)
    import bench  # the tree's own bench module

    out = {"tree": tree, "probes": {}}

    def probe_env():
        return {
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "canary_sec": bench._speed_canary(),
        }

    from gcf_corima_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="ab-serving")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(tree, ".scratch", "retrieval_idx_sf1")
    assert os.path.exists(os.path.join(root, "postings")), root

    pre = probe_env()
    t0 = time.perf_counter()
    serving = bench._bench_bm25_serving(spark, root)
    serving_wall = round(time.perf_counter() - t0, 2)
    post = probe_env()
    out["probes"]["serving"] = {
        "pre": pre, "post": post, "block_wall_sec": serving_wall,
        "serve_qps": serving.get("queries_per_sec"),
        "batch_p50_sec": serving.get("batch_p50_sec"),
        "batch_p95_sec": serving.get("batch_p95_sec"),
        "mixed_qps": serving.get("mixed", {}).get("queries_per_sec"),
        "mixed_batch_p50_sec": serving.get("mixed", {}).get(
            "batch_p50_sec"
        ),
        "mode_floor": serving.get("mixed", {}).get("mode_floor"),
    }

    pre = probe_env()
    t0 = time.perf_counter()
    bench.bench_facade_full(spark)
    facade_wall = round(time.perf_counter() - t0, 2)
    post = probe_env()
    out["probes"]["facade_full"] = {
        "pre": pre, "post": post, "wall_sec": facade_wall,
    }

    print("AB_PROBE_JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
