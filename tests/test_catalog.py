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
