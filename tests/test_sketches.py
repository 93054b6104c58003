"""Mergeable distinct-count sketches (operators/sketches.py).

Pins the two load-bearing claims: bitmap distinct is EXACT (equals
countDistinct, including id 0), and shard-then-merge equals one-shot for
both tiers (the incremental-ingest contract — day N+1 is a merge, not a
rescan)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import BinaryType

from gcf_corima_parquet_converter_spark import catalog
from gcf_corima_parquet_converter_spark.operators import sketches as K


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return catalog.load(spark, sf_dir, "events")


def _exact(events):
    return {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }


def test_bitmap_distinct_exact(events):
    got = {
        r["event_type"]: r["n_distinct"]
        for r in K.bitmap_distinct(events, ["event_type"], "user_id").collect()
    }
    assert got == _exact(events)


def test_bitmap_handles_id_zero(spark):
    df = spark.createDataFrame([(0,), (0,), (1,), (32768,)], "id long")
    [row] = K.bitmap_distinct(df, [], "id").collect()
    assert row["n_distinct"] == 3


def test_bitmap_shard_merge_equals_oneshot(events):
    # Shard on an arbitrary predicate with overlap in id coverage.
    a = events.filter(F.col("event_id") % 3 != 0)
    b = events.filter(F.col("event_id") % 2 == 0)  # overlaps a
    shards = K.bitmap_shard_sketch(a, ["event_type"], "user_id").unionByName(
        K.bitmap_shard_sketch(b, ["event_type"], "user_id")
    )
    merged = {
        r["event_type"]: r["n_distinct"]
        for r in K.bitmap_merge(shards, ["event_type"]).collect()
    }
    union = a.unionByName(b)
    assert merged == _exact(union)


def test_bitmap_sketch_is_binary_and_small(events):
    sk = K.bitmap_shard_sketch(events, ["event_type"], "user_id")
    assert isinstance(sk.schema["bitmap"].dataType, BinaryType)
    rows = sk.collect()
    # user_id in [0, 32768) -> at most two buckets per group (Spark's
    # bucket numbering is 1-based for positive ids; id 0 maps to bucket 0).
    assert all(len(r["bitmap"]) <= 4096 for r in rows)
    assert sk.groupBy("event_type").count().agg(F.max("count")).first()[0] <= 2


def test_hll_merge_equals_global_sketch(events):
    # Merging shard sketches must reproduce the single-pass sketch estimate
    # exactly (HLL union is lossless at equal lg_k).
    one = {
        r["event_type"]: r["approx_distinct"]
        for r in K.hll_merge(
            K.hll_shard_sketch(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    a = events.filter(F.col("event_id") % 3 != 0)
    b = events.filter(F.col("event_id") % 3 == 0)
    shards = K.hll_shard_sketch(a, ["event_type"], "user_id").unionByName(
        K.hll_shard_sketch(b, ["event_type"], "user_id")
    )
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in K.hll_merge(shards, ["event_type"]).collect()
    }
    assert merged == one


def test_hll_estimate_close_to_exact(events):
    exact = _exact(events)
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in K.hll_merge(
            K.hll_shard_sketch(events, ["event_type"], "user_id", lg_k=14),
            ["event_type"],
        ).collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n)


def test_hll_merge_allows_mixed_precision(spark):
    df = spark.range(0, 1000).withColumn("g", F.lit("x"))
    coarse = K.hll_shard_sketch(df, ["g"], "id", lg_k=10)
    fine = K.hll_shard_sketch(df, ["g"], "id", lg_k=14)
    [row] = K.hll_merge(coarse.unionByName(fine), ["g"]).collect()
    assert abs(row["approx_distinct"] - 1000) <= 100


def test_bitmap_negative_and_null_ids_match_count_distinct(spark):
    vals = [(-3,), (3,), (-1,), (1,), (0,), (None,), (-32769,), (32768,)]
    df = spark.createDataFrame(vals, "id long")
    [row] = K.bitmap_distinct(df, [], "id").collect()
    exact = df.agg(F.countDistinct("id")).first()[0]
    assert row["n_distinct"] == exact == 7  # null ignored, signs distinct


def test_sketch_tables_roundtrip_parquet_and_merge(spark, events, tmp_path):
    """The artifact contract: shard sketch tables persist to parquet
    (binary columns intact) and later sessions merge the FILES, never
    the raw data."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    for i, part in enumerate((a, b)):
        K.hll_shard_sketch(part, ["event_type"], "user_id").write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"hll_day{i}"))
        K.bitmap_shard_sketch(part, ["event_type"], "user_id").write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"bmp_day{i}"))
    hll = spark.read.parquet(str(tmp_path / "hll_day0"), str(tmp_path / "hll_day1"))
    bmp = spark.read.parquet(str(tmp_path / "bmp_day0"), str(tmp_path / "bmp_day1"))
    exact = _exact(events)
    got_exact = {
        r["event_type"]: r["n_distinct"]
        for r in K.bitmap_merge(bmp, ["event_type"]).collect()
    }
    assert got_exact == exact
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in K.hll_merge(hll, ["event_type"]).collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n)


# ------------------------------------------------------------ histogram


def test_histogram_merge_equals_oneshot_and_overflow(spark):
    base = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 1200).cast("double").alias("v"),  # 1000+ overflows
    )
    lo, hi, bins = 0.0, 1000.0, 100
    one = {
        (r["g"], r["_bucket"]): r["n"]
        for r in K.histogram_shard_sketch(base, ["g"], "v", lo, hi, bins).collect()
    }
    shards = K.histogram_shard_sketch(
        base.filter(F.col("id") % 2 == 0), ["g"], "v", lo, hi, bins
    ).unionByName(
        K.histogram_shard_sketch(
            base.filter(F.col("id") % 2 == 1), ["g"], "v", lo, hi, bins
        )
    )
    merged = {
        (r["g"], r["_bucket"]): r["n"]
        for r in K.histogram_merge(shards, ["g"]).collect()
    }
    assert merged == one
    # overflow mass (v >= 1000) sits in bucket n_bins+1, not dropped
    overflow = sum(n for (g, b), n in merged.items() if b == bins + 1)
    assert overflow == base.filter(F.col("v") >= hi).count()


def test_histogram_percentiles_within_bin_width(spark):
    import random

    rng = random.Random(13)
    rows = [(i % 2, rng.uniform(0.0, 1.0)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "g int, v double")
    lo, hi, bins = 0.0, 1.0, 200
    sk = K.histogram_shard_sketch(df, ["g"], "v", lo, hi, bins)
    got = {
        (r["g"], r["q"]): r["value"]
        for r in K.histogram_percentiles(sk, ["g"], [0.5, 0.9], lo, hi, bins).collect()
    }
    width = (hi - lo) / bins
    for g in (0, 1):
        vals = sorted(v for gg, v in rows if gg == g)
        for q in (0.5, 0.9):
            exact = vals[int(q * len(vals)) - 1]
            assert abs(got[(g, q)] - exact) <= 2 * width, (g, q)
    # no global funnel: the cumulative walk partitions by the group keys
    plan = (
        K.histogram_percentiles(sk, ["g"], [0.5], lo, hi, bins)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


# --------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_when_items_fit(spark):
    """max_items >= distinct items per group -> the sketch is a complete
    counting map: results equal the exact groupBy top-k, ties re-sorted
    (est_count desc, item) deterministically."""
    # distinct per-item counts: the k-boundary must not be tied (at a
    # tied boundary ANY top-k — sketch or exact — picks arbitrarily)
    mults = [("a", 50), ("b", 40), ("c", 30), ("d", 20), ("e", 10), ("f", 5)]
    rows = [
        (g, w) for g in (0, 1, 2) for w, n in mults for _ in range(n + g)
    ]
    df = spark.createDataFrame(rows, "g int, w string").repartition(8)
    got = K.heavy_hitters(df, ["g"], "w", k=4, max_items=64).collect()

    import collections

    exact: dict[int, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for g, w in rows:
        exact[g][w] += 1
    for g in (0, 1, 2):
        want = sorted(exact[g].items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        mine = [(r["item"], r["est_count"]) for r in got if r["g"] == g]
        assert mine == want, (g, mine, want)


def test_topk_merge_equals_oneshot_and_persists(spark, tmp_path):
    """Shard sketches -> parquet -> read back -> combine == sketching
    the union in one pass (the persistable-artifact contract every
    sketch tier carries)."""
    a = spark.createDataFrame(
        [(1, f"w{i % 13}") for i in range(3000)], "g int, w string"
    )
    b = spark.createDataFrame(
        [(1, f"w{i % 5}") for i in range(2000)], "g int, w string"
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    K.topk_shard_sketch(a, ["g"], "w", max_items=32).write.parquet(p1)
    K.topk_shard_sketch(b, ["g"], "w", max_items=32).write.parquet(p2)
    shards = spark.read.parquet(p1).unionByName(spark.read.parquet(p2))
    merged = K.topk_estimate(
        K.topk_merge(shards, ["g"], max_items=32), ["g"], k=6
    ).collect()
    oneshot = K.heavy_hitters(
        a.unionByName(b), ["g"], "w", k=6, max_items=32
    ).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in oneshot]


def test_heavy_hitters_no_raw_value_shuffle(spark, sf_dir):
    """The scale contract: raw (keys, value) pairs never ride an
    exchange — only <= max_items sketch structs do.  The plan must show
    a partial aggregate BELOW the exchange (objHashAggregate partial
    merge), and no Python."""
    from gcf_corima_parquet_converter_spark import catalog

    e = catalog.load(spark, sf_dir, "events")
    df = K.heavy_hitters(e, [], "event_type", k=3, max_items=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    # partial aggregation before the final single-sketch reduce
    assert plan.lower().count("aggregate") >= 2
    rows = df.collect()
    assert len(rows) == 3 and rows[0]["est_count"] >= rows[-1]["est_count"]
