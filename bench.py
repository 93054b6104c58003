#!/usr/bin/env python3
"""Headline benchmark: times representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "queries_warm": {...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full execution,
no driver-side collect of the result set, no sink I/O in the timing).

Methodology (round 4, median-of-3): single-shot cold numbers at sf0.1
are compile/JIT-dominated and could not resolve ~10% deltas (BENCH_r03's
q26/q52/q53/q60 "regressions" were indistinguishable from noise).  The
bench now launches THREE worker subprocesses — each a fresh JVM, because
Spark's whole-stage-codegen class cache is JVM-static, so a cold run
only exists once per process — and each worker runs the headline list
once cold plus twice warm.  "queries"/"value" is the per-query MEDIAN of
the 3 cold samples (comparable to BENCH_r01..r03, which were single-shot
cold); "queries_warm"/"total_warm_wall_sec" is the per-query median of
the 6 warm samples: steady-state execution only, the honest proxy for
at-scale throughput — on a 100 TB corpus codegen is microseconds against
minutes of scan, so warm deltas are what plan changes actually move.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
N_WARM_PER_RUN = 2

# Representative slice of the corpus: scan+agg, multi-join, window,
# event-time, dedup (exact + minhash), similarity top-k, text scoring,
# and the flagship telemetry pipeline.
HEADLINE = [
    "q00_flagship_daily_rms",
    "q01_pricing_summary",
    "q03_region_revenue",
    "q05_customers_without_orders",
    "q08_top_orders_per_customer",
    "q14_hourly_rms",
    "q15_user_sessions",
    "q21_dedup_exact_stats",
    "q22_dedup_keep_first",
    "q23_text_quality",
    "q25_cosine_topk",
    "q26_minhash_near_dup",
    "q49_source_quota",
    "q50_hash_split",
    "q52_contamination",
    "q53_sql_above_avg_orders",
    "q60_curation_pipeline",
]


def bench_streaming(spark, sf_dir: str) -> dict:
    """Structured-Streaming throughput probe: replay the sf events table
    as a parquet stream through streaming_rms and time source-to-sink
    wall clock.

    The event rows are mapped deterministically onto the telemetry
    sample shape (dense 1 ms spacing so 1 s windows pass the
    completeness gate); the number measures the micro-batch engine +
    stateful window path, not the mapping.  Reported SEPARATELY from
    the headline total so round-over-round query comparisons stay
    apples-to-apples.

    Round-3's ~10.3k rows/s floor was profiled (r4): it was per-batch
    FIXED overhead, not data throughput — with maxFilesPerTrigger=1 the
    8-batch replay paid ~0.9 s per micro-batch (durationMs: addBatch
    ~0.7 s of state-store open/commit across 32 HDFSBackedStateStore
    instances + ~60 ms planning + ~75 ms WAL/offset commits) against
    only 12.5k rows of data per batch.  Two knobs remove it: (1) batch
    sizing — all 8 files in one availableNow batch (5x); (2) state
    partitioning — the number of state-store instances equals
    spark.sql.shuffle.partitions at FIRST run, and 32 instances for a
    ~100-key window state is pure per-batch overhead, so the probe pins
    8 (another ~1.7x; measured 80k+ rows/s combined).  At 100 TB the
    same law applies per executor: size micro-batches so per-batch data
    work dominates the ~1 s fixed cost, and size state partitions to
    the steady-state key cardinality, not the batch-analytics default.
    """
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from gcf_corima_parquet_converter_spark.streaming.ingest import streaming_rms

    work = tempfile.mkdtemp(prefix="bench_stream_")
    replay, ckpt = os.path.join(work, "replay"), os.path.join(work, "ckpt")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        samples = events.select(
            ((F.col("event_id") % 600_000) / 1000.0).alias("Time"),
            F.col("event_type").alias("comp_name"),
            F.col("value").alias("A_x_g"),
            (F.col("value") * 0.5).alias("A_y_g"),
            (-F.col("value")).alias("A_z_g"),
        )
        samples.repartition(8).write.parquet(replay)
        n_rows = events.count()

        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            src = (
                spark.readStream.schema(spark.read.parquet(replay).schema)
                .option("maxFilesPerTrigger", 8)
                .parquet(replay)
            )
            t0 = time.perf_counter()
            q = (
                streaming_rms(src)
                .writeStream.format("noop")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            batches = q.lastProgress["batchId"] + 1 if q.lastProgress else -1
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        return {
            "streaming_rms_replay_sec": round(wall, 3),
            "rows_per_sec": round(n_rows / wall),
            "micro_batches": batches,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_ann(spark, sf_dir: str) -> dict:
    """ANN quality/speed probe: brute-force cosine top-k is ground
    truth; IVF and PQ report recall@10 against it plus wall time.
    Recall is the axis the headline timings can't show — a fast ANN
    variant that returns the wrong neighbors is not an ANN.

    Context for the absolute numbers: the synthetic embeddings are
    ISOTROPIC RANDOM, so true neighbors have barely-above-noise
    similarity and any partition-pruning ANN's recall is bounded by
    its scan fraction (curse of dimensionality — with 4 of 16 IVF
    lists probed, ~25% is the theoretical floor and ~0.4 is a normal
    draw).  On clustered real-world embeddings the same index recalls
    0.9+; the planted-structure recall tests in
    tests/test_dedup_similarity.py pin that regime.  The probe's job
    here is regression tracking: recall collapsing toward 0 or time
    blowing up flags a broken index, not a bad corpus."""
    import pyspark.sql.functions as F

    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators import similarity as S

    emb = catalog.load(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    k = 10

    def timed_ids(df):
        t0 = time.perf_counter()
        ids = [r["vec_id"] for r in df.collect()]
        return set(ids), time.perf_counter() - t0

    brute, t_brute = timed_ids(S.cosine_topk(emb, qvec, k=k))
    # standard ANN methodology: index build (train/assign/encode) is a
    # one-time cost amortized over every query — persist the index
    # tables and time SEARCH only, as a deployed index would run
    cents = S.train_centroids_sample(emb, n_centroids=16)
    assigned = S.ivf_assign(emb, cents).persist()
    assigned.count()
    pq = S.pq_train(emb, m=8, n_codes=16)
    encoded = S.pq_encode(emb, pq, use_arrow=True).persist()
    encoded.count()
    try:
        ivf, t_ivf = timed_ids(S.ivf_topk(assigned, cents, qvec, k=k, n_probe=4))
        pqr, t_pq = timed_ids(S.pq_topk(encoded, pq, qvec, k=k))
        rr, t_rr = timed_ids(S.pq_topk_rerank(encoded, emb, pq, qvec, k=k))
    finally:
        assigned.unpersist()
        encoded.unpersist()
    return {
        "k": k,
        "corpus": "isotropic-random (recall ~ scan fraction; see docstring)",
        "brute_sec": round(t_brute, 3),
        "ivf_sec": round(t_ivf, 3),
        "ivf_scan_fraction": 4 / 16,
        "ivf_recall": round(len(ivf & brute) / k, 3),
        "pq_sec": round(t_pq, 3),
        "pq_recall": round(len(pqr & brute) / k, 3),
        "pq_rerank_sec": round(t_rr, 3),
        "pq_rerank_recall": round(len(rr & brute) / k, 3),
    }


def worker(sf_dir: str, with_streaming: bool) -> None:
    """One fresh-JVM sample: warmup, one cold pass, N_WARM_PER_RUN warm
    passes (+ optionally the streaming probe).  Emits one JSON line."""
    from gcf_corima_parquet_converter_spark.session import get_spark
    from gcf_corima_parquet_converter_spark import queries as Q

    spark = get_spark(app_name="spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM once so timings measure the engine, not first-touch
    # classloading and codegen compilation: a tiny query touching the
    # agg + broadcast-join + window code paths on the 5-row region table.
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("r_name").orderBy("n_name")),
        )
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("rk").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    cold: dict[str, float] = {}
    warm: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = time.perf_counter() - t0
        for _ in range(N_WARM_PER_RUN):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm[name].append(time.perf_counter() - t0)
        print(
            f"# {name}: {cold[name]:.3f}s cold / "
            + "/".join(f"{w:.3f}" for w in warm[name])
            + "s warm",
            file=sys.stderr,
        )

    out = {"cold": cold, "warm": warm}
    if with_streaming:
        out["streaming"] = bench_streaming(spark, sf_dir)
        out["ann"] = bench_ann(spark, sf_dir)
    print("BENCH_WORKER_JSON:" + json.dumps(out))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    if "--worker" in sys.argv:
        worker(sf_dir, with_streaming="--stream" in sys.argv)
        return

    samples = []
    for i in range(N_RUNS):
        argv = [sys.executable, os.path.abspath(__file__), "--worker"]
        if i == N_RUNS - 1:
            argv.append("--stream")
        print(f"# bench run {i + 1}/{N_RUNS} (fresh JVM)", file=sys.stderr)
        proc = subprocess.run(argv, capture_output=True, text=True)
        sys.stderr.write(proc.stderr)
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("BENCH_WORKER_JSON:")),
            None,
        )
        if line is None:
            print(proc.stdout, file=sys.stderr)
            raise RuntimeError(f"bench worker {i + 1} produced no result line")
        samples.append(json.loads(line[len("BENCH_WORKER_JSON:") :]))

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(statistics.median(s["cold"][name] for s in samples), 3)
        warm[name] = round(
            statistics.median(w for s in samples for w in s["warm"][name]), 3
        )

    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "total_warm_wall_sec": round(sum(warm.values()), 3),
                "streaming": samples[-1].get("streaming"),
                "ann": samples[-1].get("ann"),
                "runs": N_RUNS,
                "aggregation": "median",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
