"""Bounded-memory aggregation stress (SURVEY.md A8 evidence): run a
high-cardinality hash aggregate in a DELIBERATELY memory-starved JVM
(600 MB driver, ``spark.memory.fraction=0.2``, 4 shuffle partitions)
so Tungsten's hash aggregate MUST fall back to sort-based spilling,
then prove the answer is still exact.

Spark's own machinery is the operator under test here — the engine
contract this repo relies on for every groupBy at 100 TB is "the
aggregate completes and is correct when the working set exceeds
memory, by spilling sorted runs to disk".  This probe makes that
contract observable: it prints one JSON line with the aggregate's
row count, two closed-form checksums, and ``memoryBytesSpilled``
summed over all stages from the app status store (non-zero = the
spill path actually executed; on this config it spills ~600 MB).

Run standalone (``python3 tools/spill_probe.py``) or through
``tests/test_scale.py::test_aggregate_spills_and_stays_exact``.
The probe must be a FRESH process: memory limits and the status
store are per-JVM, so it cannot share the test session.
"""
import json
import os
import sys


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    n = int(os.environ.get("SPILL_PROBE_ROWS", 4_000_000))
    n_keys = int(os.environ.get("SPILL_PROBE_KEYS", 500_000))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("spill-probe")
        .config("spark.driver.memory", "600m")
        .config("spark.memory.fraction", "0.2")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # ~90 bytes of payload string per row keeps the per-key state fat
    # enough that the hash aggregate's working set exceeds the squeezed
    # execution-memory pool in every partition
    df = spark.range(n).select(
        (F.col("id") % n_keys).alias("k"),
        F.concat(
            F.lit("payload-"), F.col("id").cast("string"),
            F.lit("-" + "x" * 64),
        ).alias("s"),
        F.col("id").cast("double").alias("v"),
    )
    agg = df.groupBy("k").agg(
        F.sum("v").alias("sv"),
        F.count("*").alias("c"),
        F.max("s").alias("ms"),
    )
    rows = agg.count()
    tot = agg.agg(F.sum("sv").alias("a"), F.sum("c").alias("b")).collect()[0]
    # memoryBytesSpilled over all stages, from the in-JVM status store
    jvm = spark._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    quantiles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, quantiles, empty)
    spilled = sum(
        stages.apply(i).memoryBytesSpilled() for i in range(stages.size())
    )
    print(json.dumps({
        "rows": rows,
        "sum_v": tot["a"],
        "sum_c": tot["b"],
        "spilled_bytes": int(spilled),
        "n": n,
        "n_keys": n_keys,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
