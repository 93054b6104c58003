"""Plugin pipeline (U1/U2/U3) + export sinks (S7/S10)."""

from __future__ import annotations

import glob
import os
import textwrap

import pandas as pd
import pyspark.sql.functions as F
import pytest

from gcf_corima_parquet_converter_spark import sinks
from gcf_corima_parquet_converter_spark.operators import plugins as P


def _events(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [10, 10, 20, 20],
                "value": [1.0, -2.0, 3.0, -4.0],
            }
        )
    )


# ------------------------------------------------------------------ chain


def test_chain_composes_in_order(spark):
    df = _events(spark)
    chain = P.PluginChain(
        [
            P.FunctionPlugin(lambda d: d.withColumn("value", F.abs("value")), "abs"),
            P.FunctionPlugin(lambda d: d.where(F.col("value") > 1.5), "gate"),
        ]
    )
    got = chain.apply(df).orderBy("event_id").collect()
    assert [r.event_id for r in got] == [2, 3, 4]
    # order matters: gate-then-abs would keep only ids 3 (value 3.0)
    rev = P.PluginChain(list(reversed(chain.plugins)))
    assert [r.event_id for r in rev.apply(df).orderBy("event_id").collect()] == [3]


def test_chain_is_one_lazy_plan(spark):
    """Filters written INSIDE a plugin must still reach the scan —
    the chain fuses into one plan Catalyst optimizes across."""
    df = _events(spark)
    chain = P.PluginChain(
        [P.FunctionPlugin(lambda d: d.where(F.col("user_id") == 10), "f")]
    )
    plan = chain.apply(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "user_id" in plan  # filter survives into the single plan


def test_lifecycle_and_tag_fanout(spark):
    calls: list[str] = []

    class Probe(P.Plugin):
        name = "probe"

        def process(self, d):
            return d

        def start_log_cb(self):
            calls.append("start")

        def stop_log_cb(self):
            calls.append("stop")

        def tag_cb(self, status, label):
            calls.append(f"tag:{status}:{label}")

    chain = P.PluginChain([Probe(), Probe()])
    chain.apply(_events(spark))
    chain.tag(True, "anomaly")
    assert calls == ["start", "start", "stop", "stop", "tag:True:anomaly", "tag:True:anomaly"]


def test_pandas_batch_plugin(spark):
    """mapInPandas plugin: batch-imperative logic with declared schema."""

    def double(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["event_id"]].copy()
        out["doubled"] = batch["value"] * 2
        return out

    plugin = P.PandasBatchPlugin(double, "event_id long, doubled double")
    got = (
        P.PluginChain([plugin])
        .apply(_events(spark))
        .orderBy("event_id")
        .collect()
    )
    assert [r.doubled for r in got] == [2.0, -4.0, 6.0, -8.0]


# -------------------------------------------------------------- discovery


def test_discover_plugins(tmp_path, spark):
    (tmp_path / "p10_abs.py").write_text(
        textwrap.dedent(
            """
            import pyspark.sql.functions as F
            from gcf_corima_parquet_converter_spark.operators.plugins import Plugin

            class PluginClass(Plugin):
                name = "abs"
                def process(self, df):
                    return df.withColumn("value", F.abs("value"))
            """
        )
    )
    (tmp_path / "p20_gate.py").write_text(
        textwrap.dedent(
            """
            import pyspark.sql.functions as F
            from gcf_corima_parquet_converter_spark.operators.plugins import Plugin

            class PluginClass(Plugin):
                name = "gate"
                def process(self, df):
                    return df.where(F.col("value") > 1.5)
            """
        )
    )
    found = P.discover_plugins(tmp_path)
    assert [p.name for p in found] == ["abs", "gate"]  # filename order
    got = P.PluginChain(found).apply(_events(spark))
    assert got.count() == 3


def test_discover_rejects_missing_export(tmp_path):
    (tmp_path / "bad.py").write_text("x = 1\n")
    with pytest.raises(ValueError, match="PluginClass"):
        P.discover_plugins(tmp_path)


# ------------------------------------------------------------------ sinks


def test_write_xsv_roundtrip(spark, tmp_path):
    df = _events(spark)
    for fmt, sep in [("CSV", ","), ("TSV", "\t")]:
        path = str(tmp_path / fmt.lower())
        sinks.write_xsv(df, path, file_format=fmt, single_file=True)
        files = glob.glob(os.path.join(path, "part-*.csv"))
        assert len(files) == 1
        first = open(files[0]).readline().rstrip("\n")
        assert first == sep.join(["event_id", "user_id", "value"])
        back = (
            spark.read.option("header", "true")
            .option("sep", sep)
            .option("inferSchema", "true")
            .csv(path)
        )
        assert sorted(r.event_id for r in back.collect()) == [1, 2, 3, 4]


def test_write_xsv_bad_format(spark, tmp_path):
    with pytest.raises(ValueError, match="CSV or TSV"):
        sinks.write_xsv(_events(spark), str(tmp_path / "x"), file_format="XLSX")


def test_write_parquet_sorted_roundtrip(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "pq")
    sinks.write_parquet(df, path, sort_by=["event_id"])
    back = spark.read.parquet(path)
    assert back.schema == df.schema
    assert sorted(r.value for r in back.collect()) == [-4.0, -2.0, 1.0, 3.0]


def test_compact_partitions_merges_small_files(spark, tmp_path):
    """Many tiny files per partition -> one file per partition after
    compaction, same rows, delta-friendly sort restored."""
    import glob
    import pandas as pd
    from gcf_corima_parquet_converter_spark.sinks import compact_partitions

    root = str(tmp_path / "table")
    pdf = pd.DataFrame(
        {
            "Time": range(1000),
            "v": [float(i) for i in range(1000)],
            "alias": ["A"] * 500 + ["B"] * 500,
        }
    )
    # simulate a drip-feed writer: 10 appends of 100 rows each
    for i in range(10):
        (
            spark.createDataFrame(pdf.iloc[i * 100 : (i + 1) * 100])
            .repartition(4)
            .write.mode("append")
            .partitionBy("alias")
            .parquet(root)
        )
    files_before = glob.glob(f"{root}/alias=*/*.parquet")
    assert len(files_before) > 20

    n = compact_partitions(spark, root, ["alias"], sort_within=["Time"])
    assert n == 1000
    files_after = glob.glob(f"{root}/alias=*/*.parquet")
    assert len(files_after) == 2  # one per partition
    back = spark.read.parquet(root).toPandas()
    assert len(back) == 1000
    assert set(back.alias) == {"A", "B"}
    assert sorted(back.Time) == list(range(1000))
    # staging prefix is cleaned up even though the write succeeded
    assert glob.glob(f"{root}/_compact_tmp_*") == []


# --------------------------------------------------- generic read/write


def test_generic_format_roundtrips(spark, tmp_path):
    import pyspark.sql.functions as F
    import pytest

    from gcf_corima_parquet_converter_spark.sources import generic as G

    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    want = sorted(tuple(r) for r in df.collect())
    ddl = "id long, k string, v double"

    for fmt in ("parquet", "orc", "csv", "tsv", "json"):
        p = str(tmp_path / f"t.{fmt if fmt != 'tsv' else 'tsv'}")
        G.write_table(df, p, fmt=fmt)
        back = G.read_table(spark, p, fmt=fmt, schema=ddl)
        assert sorted(tuple(r) for r in back.collect()) == want, fmt
        # inference path reads the same table with no fmt argument
        back2 = G.read_table(spark, p, schema=ddl)
        assert back2.count() == 100, fmt

    # partitioned ORC write + extension inference + pushdown survives
    p = str(tmp_path / "part.orc")
    G.write_table(df, p, partition_by=["k"])
    back = G.read_table(spark, p, schema="id long, v double, k string")
    assert back.where(F.col("k") == "3").count() == 20
    plan = (
        back.where(F.col("k") == "3")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan or "k#" in plan  # partition pruning

    with pytest.raises(ValueError, match="spark-avro"):
        G.infer_format("x.avro")
    with pytest.raises(ValueError, match="cannot infer"):
        G.infer_format("x.xyz")
    assert G.infer_format("dir/") == "parquet"
    assert G.infer_format("docs.jsonl.gz") == "json"


def test_write_parquet_pinned_reference_encodings(spark, tmp_path):
    """r12 S7 byte-parity escape hatch: the pyarrow final-stage writer
    pins the reference's exact per-column encodings
    (main.py:107-119 — Time=DELTA_BINARY_PACKED, alias=dictionary),
    verified via ParquetFile metadata; values roundtrip exactly and
    the write is one pyarrow file per Spark partition (distributed)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    n = 10_000
    pdf = pd.DataFrame(
        {
            "Time": np.arange(n, dtype=np.int64) * 500_000 + 1_700_000_000_000_000_000,
            "A_x_g": np.sin(np.arange(n) / 7.0),
            "alias": ["LAF1"] * n,
        }
    )
    df = spark.createDataFrame(pdf).repartition(4)
    path = str(tmp_path / "pinned")
    res = sinks.write_parquet_pinned(df, path, sort_by=["Time"])
    assert res["rows"] == n and res["files"] == 4

    import glob

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4
    for f in files:
        md = pq.ParquetFile(f).metadata
        enc = {
            md.row_group(g).column(i).path_in_schema: md.row_group(g)
            .column(i)
            .encodings
            for g in range(md.num_row_groups)
            for i in range(md.num_columns)
        }
        assert "DELTA_BINARY_PACKED" in enc["Time"], enc["Time"]
        assert not any("DICTIONARY" in e for e in enc["Time"])
        assert any("DICTIONARY" in e for e in enc["alias"]), enc["alias"]
        # data-page v2 + snappy (the reference's writer posture)
        col = pq.ParquetFile(f).metadata.row_group(0).column(0)
        assert col.compression == "SNAPPY"

    back = spark.read.parquet(path).orderBy("Time").toPandas()
    pd.testing.assert_frame_equal(
        back[["Time", "A_x_g", "alias"]],
        pdf.sort_values("Time").reset_index(drop=True),
    )


def test_write_parquet_pinned_float_time_skips_delta_default(spark, tmp_path):
    """r13 (ADVICE): the Time->DELTA_BINARY_PACKED default applies only
    when Time is integral — on a raw float64-seconds decode frame the
    default falls back to {} (the write succeeds) instead of failing
    executor-side inside pyarrow, and an EXPLICIT delta request on a
    float column raises a clear driver-side error naming the dtype."""
    import pandas as pd
    import pytest as _pytest

    pdf = pd.DataFrame({"Time": [0.001, 0.002, 0.003], "v": [1.0, 2.0, 3.0]})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "float_time")
    res = sinks.write_parquet_pinned(df, path)  # default: no delta pin
    assert res["rows"] == 3
    back = spark.read.parquet(path).orderBy("Time").toPandas()
    pd.testing.assert_frame_equal(back[["Time", "v"]], pdf)

    with _pytest.raises(ValueError, match="double.*cast it first|requires an"):
        sinks.write_parquet_pinned(
            df,
            str(tmp_path / "x"),
            column_encodings={"Time": "DELTA_BINARY_PACKED"},
        )


def test_write_parquet_pinned_delta_on_short_and_date(spark, tmp_path):
    """r13 advice: DELTA_BINARY_PACKED is valid on ANY type Arrow
    stores as parquet physical INT32/INT64 — byte/short widen to
    INT32, date is INT32 days — so explicit pins on those columns
    write (and round-trip) instead of raising the int/long-only
    error."""
    import datetime
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "s": pd.array([1, 2, 3], dtype="int16"),
            "d": [datetime.date(2026, 1, i + 1) for i in range(3)],
            "v": [1.0, 2.0, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "short_date")
    res = sinks.write_parquet_pinned(
        df,
        path,
        column_encodings={"s": "DELTA_BINARY_PACKED",
                          "d": "DELTA_BINARY_PACKED"},
        sort_by=["s"],
    )
    assert res["rows"] == 3
    enc = {}
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                enc.setdefault(col.path_in_schema, set()).update(
                    col.encodings
                )
    assert "DELTA_BINARY_PACKED" in enc["s"]
    assert "DELTA_BINARY_PACKED" in enc["d"]
    back = spark.read.parquet(path).orderBy("s").toPandas()
    pd.testing.assert_frame_equal(back[["s", "d", "v"]], pdf)


def test_write_parquet_pinned_rejects_unknown_column(spark, tmp_path):
    df = _events(spark)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pinned columns"):
        sinks.write_parquet_pinned(
            df, str(tmp_path / "x"), column_encodings={"nope": "PLAIN"}
        )
