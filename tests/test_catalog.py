"""Relation-cache contract of catalog.load: cached relations are
per-(session, path) snapshots; refresh/invalidate are the escape hatch
when a path is rewritten mid-session (ADVICE r4)."""

import os
import shutil

from gcf_corima_parquet_converter_spark import catalog


def _write_region(spark, path, n):
    spark.range(n).selectExpr(
        "cast(id as int) as r_regionkey",
        "concat('R', id) as r_name",
        "'x' as r_comment",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_load_caches_relation(spark, sf_dir):
    a = catalog.load(spark, sf_dir, "region")
    b = catalog.load(spark, sf_dir, "region")
    assert a is b  # same analyzed relation object, no re-listing


def test_refresh_and_invalidate_see_rewritten_path(spark, tmp_path):
    d = str(tmp_path / "sfx")
    os.makedirs(d)
    _write_region(spark, f"{d}/region.parquet", 3)
    assert catalog.load(spark, d, "region").count() == 3

    # rewrite the path: the cached file index is stale by design...
    shutil.rmtree(f"{d}/region.parquet")
    _write_region(spark, f"{d}/region.parquet", 7)
    # ...and refresh=True replaces the entry
    assert catalog.load(spark, d, "region", refresh=True).count() == 7
    assert catalog.load(spark, d, "region").count() == 7  # new entry sticks

    # invalidate(sf_dir) drops the whole dir's entries
    shutil.rmtree(f"{d}/region.parquet")
    _write_region(spark, f"{d}/region.parquet", 5)
    catalog.invalidate(d)
    assert catalog.load(spark, d, "region").count() == 5


def test_conform_schema_evolution(spark):
    import pyspark.sql.functions as F
    import pytest
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from gcf_corima_parquet_converter_spark.schema.sanitize import (
        conform_schema,
    )

    target = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
    ])
    # old batch: missing score, extra legacy column, doc_id as int string
    old = spark.createDataFrame(
        [("1", "a", "legacy"), ("2", "b", "legacy")],
        "doc_id string, text string, old_col string",
    )
    out = conform_schema(old, target)
    assert [f.name for f in out.schema.fields] == ["doc_id", "text", "score"]
    assert dict(out.dtypes) == {"doc_id": "bigint", "text": "string",
                                "score": "double"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["score"] is None and rows[1]["text"] == "a"

    kept = conform_schema(old, target, on_extra="keep")
    assert kept.columns == ["doc_id", "text", "score", "old_col"]
    with pytest.raises(ValueError, match="unexpected columns"):
        conform_schema(old, target, on_extra="error")

    # conformed batches union + append cleanly with a canonical frame
    new = spark.createDataFrame([(3, "c", 0.5)], target)
    both = conform_schema(old, target).unionByName(new)
    assert both.count() == 3

    # non-strict: a garbage cast nulls instead of failing at run time
    bad = spark.createDataFrame([("x", "t")], "doc_id string, text string")
    [r] = conform_schema(bad, target, strict_casts=False).collect()
    assert r["doc_id"] is None

    # pure projection: no exchange in the plan
    plan = conform_schema(old, target)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
