"""Scale toolkit: bucketed co-located joins (no shuffle) + skew salting."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from gcf_corima_parquet_converter_spark import catalog
from gcf_corima_parquet_converter_spark.operators import scale


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    o = catalog.load(spark, sf_dir, "orders")
    l = catalog.load(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    scale.write_bucketed(
        o, "t_orders_b", ["o_orderkey"], n_buckets=8, path=str(tmp_path / "o")
    )
    scale.write_bucketed(
        l, "t_lineitem_b", ["o_orderkey"], n_buckets=8, path=str(tmp_path / "l")
    )
    # at sf-test size both sides auto-broadcast, which ignores bucketing;
    # force the big⋈big shape (SMJ) the technique exists for
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.bucketed_join(
            spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:2000]}"
        )
        assert "Bucketed: true" in plan
        # same rows as the shuffled join
        expect = o.join(l, "o_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for t in ("t_orders_b", "t_lineitem_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of big rows hit key 1
    big = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 900 + list(range(2, 102)), "v": range(1000)})
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": range(1, 102), "name": [f"n{i}" for i in range(1, 102)]})
    )
    got = scale.salted_join(big, dim, "k", salt=8)
    plain = big.join(dim, "k")
    assert got.count() == plain.count() == 1000
    assert sorted(r.v for r in got.where(F.col("k") == 1).collect()) == sorted(
        r.v for r in plain.where(F.col("k") == 1).collect()
    )
    assert set(got.columns) == set(plain.columns)


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame(pd.DataFrame({"k": [1] * 1000, "v": range(1000)}))
    dim = spark.createDataFrame(pd.DataFrame({"k": [1], "name": ["hot"]}))
    salted = big.withColumn(
        "_sg_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8))
    )
    n_salts = salted.select("_sg_salt").distinct().count()
    assert n_salts >= 6  # hot key really scatters over most salt values
    assert scale.salted_join(big, dim, "k", salt=8).count() == 1000


def test_ensure_min_parallelism_spreads_small_scan(spark, tmp_path):
    """A 1-split scan gets one pinned spread exchange; an input that
    already exposes enough partitions passes through untouched."""
    import pyspark.sql.functions as F

    from gcf_corima_parquet_converter_spark.operators.scale import (
        ensure_min_parallelism,
    )

    p = str(tmp_path / "one_file")
    spark.range(100).coalesce(1).write.parquet(p)
    small = spark.read.parquet(p)
    out = ensure_min_parallelism(small, "id")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert "Exchange hashpartitioning" in out._jdf.queryExecution().executedPlan().toString()
    assert out.rdd.getNumPartitions() == n_part

    wide = spark.range(1000).repartition(n_part, "id")
    assert ensure_min_parallelism(wide, "id") is wide  # no-op, same object

    # file-rich scan: the cheap leaf-file probe settles it (the at-scale
    # case pays no physical-planning pass — ADVICE r4)
    many = str(tmp_path / "many_files")
    spark.range(1000).repartition(n_part).write.parquet(many)
    rich = spark.read.parquet(many)
    assert len(rich.inputFiles()) * 2 >= spark.sparkContext.defaultParallelism
    assert ensure_min_parallelism(rich, "id") is rich
