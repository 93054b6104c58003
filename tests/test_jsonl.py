"""JSONL source/sink (sources/jsonl.py, sinks.write_jsonl)."""

import glob
import gzip
import os

import pyspark.sql.functions as F

from gcf_corima_parquet_converter_spark import catalog, sinks
from gcf_corima_parquet_converter_spark.sources import jsonl as J

DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_jsonl_roundtrip_gzip_shards(spark, sf_dir, tmp_path):
    docs = catalog.load(spark, sf_dir, "documents").limit(50)
    out = str(tmp_path / "corpus")
    sinks.write_jsonl(docs.repartition(4), out, records_per_file=20)
    shards = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(shards) >= 4  # one shard per partition, never coalesced
    with gzip.open(shards[0], "rt") as fh:
        assert fh.readline().startswith("{")
    back = J.read_jsonl(spark, out, DOCS_DDL)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select(*back.columns).collect())
    )


def test_jsonl_corrupt_quarantine_and_audit(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        '{"doc_id": 2, "text": "also ok"}\n'
        "{truncated garbag\n"
    )
    good = J.read_jsonl(spark, str(p), "doc_id bigint, text string")
    assert good.count() == 2  # DROPMALFORMED default skips the bad line
    kept = J.read_jsonl(
        spark, str(p), "doc_id bigint, text string", corrupt_col="_bad"
    )
    assert kept.count() == 3
    # quarantine flow: referenced columns must include a data column
    # (Spark disallows corrupt-column-only queries, SPARK-24208)
    # (.collect, not .count — pruning would strip doc_id back out)
    bad_rows = (
        kept.select("doc_id", "_bad").filter(F.col("_bad").isNotNull()).collect()
    )
    assert len(bad_rows) == 1 and bad_rows[0]["doc_id"] is None
    [audit] = J.corrupt_line_audit(kept, "_bad").collect()
    assert (audit["n_lines"], audit["n_malformed"]) == (3, 1)
    assert abs(audit["malformed_frac"] - 1 / 3) < 1e-12
    assert audit["n_first_field_parsed"] == 2


def test_jsonl_keep_nulls_toggle(spark, tmp_path):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    omit, keep = str(tmp_path / "omit"), str(tmp_path / "keep")
    sinks.write_jsonl(df.coalesce(1), omit, compression="none")
    sinks.write_jsonl(df.coalesce(1), keep, compression="none", keep_nulls=True)

    def first_line(d):
        [f] = glob.glob(os.path.join(d, "part-*.json"))
        return open(f).readline()

    assert "text" not in first_line(omit)
    assert '"text":null' in first_line(keep)


def test_jsonl_scan_prunes_columns(spark, sf_dir, tmp_path):
    docs = catalog.load(spark, sf_dir, "documents").limit(20)
    out = str(tmp_path / "corpus")
    sinks.write_jsonl(docs, out)
    plan = (
        J.read_jsonl(spark, out, DOCS_DDL)
        .select("text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<text:string>" in plan
