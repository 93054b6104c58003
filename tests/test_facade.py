"""Acquisition facade (SURVEY §2.11): the HSDatalog-equivalent surface
— create/info/firmware/sensor accessors + convert_dat_to_xsv with time
slicing, tag labeling, raw-data and format selection (main.py:64-81)."""

import numpy as np
import pytest

from gcf_corima_parquet_converter_spark.sources.facade import (
    Acquisition,
    tag_intervals,
)
from gcf_corima_parquet_converter_spark.sources.synthetic import (
    SENSOR,
    write_acquisition,
)

START = "2025-07-11T16:22:17.000Z"


@pytest.fixture(scope="module")
def acq_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("acq") / "LAF1_20250711_16_22_17")
    # tag events: label "run" open at +1.0 s, close at +3.0 s (relative)
    tags = [
        {"l": "run", "e": True, "ta": 1.0},
        {"l": "run", "e": False, "ta": 3.0},
    ]
    in_g, t = write_acquisition(folder, start_time=START, tags=tags, n_seconds=5.0)
    return folder, in_g, t


def test_metadata_accessors(spark, acq_folder):
    folder, _, _ = acq_folder
    hsd = Acquisition(spark, folder)
    assert hsd.sensors == [SENSOR]
    info = hsd.get_acquisition_info()
    assert info["start_time"] == START
    assert hsd.get_firmware_info()["firmware_info"]["alias"] == "LAF1"
    meta = hsd.get_sensor(SENSOR)
    assert meta.params.dim == 3 and meta.params.data_type == "int16"


def test_create_on_incomplete_folder_raises(spark, tmp_path):
    folder = str(tmp_path / "incomplete")
    write_acquisition(folder, incomplete=True, n_seconds=0.5)
    with pytest.raises(FileNotFoundError):
        Acquisition(spark, folder)


def test_tag_intervals_event_pairing():
    from datetime import datetime, timezone

    start = datetime(2025, 7, 11, 16, 22, 17, tzinfo=timezone.utc)
    info = {
        "tags": [
            {"l": "a", "e": True, "ta": 1.0},
            {"l": "b", "e": True, "ta": "2025-07-11T16:22:19.000Z"},
            {"l": "a", "e": False, "ta": 2.5},
            {"label": "pre", "start": 0.0, "end": 0.5},
        ]
    }
    got = tag_intervals(info, start)
    assert ("a", 1.0, 2.5) in got
    assert ("pre", 0.0, 0.5) in got
    b = [iv for iv in got if iv[0] == "b"][0]
    assert b[1] == pytest.approx(2.0) and b[2] == float("inf")


def test_load_scaled_vs_raw(spark, acq_folder):
    folder, in_g, _ = acq_folder
    hsd = Acquisition(spark, folder)
    scaled = hsd.load(SENSOR, absolute_time=False)[SENSOR]
    raw = hsd.load(SENSOR, raw_data=True, absolute_time=False)[SENSOR]
    cols = [c for c in scaled.columns if c.startswith("A_")]
    s = scaled.orderBy("Time").limit(100).toPandas()
    r = raw.orderBy("Time").limit(100).toPandas()
    sens = hsd.get_sensor(SENSOR).params.sensitivity
    for c in cols:
        np.testing.assert_allclose(r[c].to_numpy() * sens, s[c].to_numpy(), rtol=1e-12)
    # scaled values match the fixture's ground truth
    np.testing.assert_allclose(s[cols[0]].to_numpy(), in_g[:100, 0], rtol=1e-12)


def test_convert_time_slice_and_labels(spark, acq_folder, tmp_path):
    folder, _, t = acq_folder
    hsd = Acquisition(spark, folder)
    out = str(tmp_path / "export")
    df = hsd.convert_dat_to_xsv(
        SENSOR, out, start_time=1.0, end_time=4.0, labeled=True,
        file_format="PARQUET",
    )
    pdf = spark.read.parquet(out).toPandas()
    n_expect = int(((t >= 1.0) & (t < 4.0)).sum())
    assert len(pdf) == n_expect and len(pdf) > 0
    assert dict(df.dtypes)["Time"] == "bigint"
    # labels: rows in [1,3) s tagged "run", the rest null
    start_ns = hsd.get_sensor(SENSOR).start_ns
    rel_s = (pdf["Time"] - start_ns) / 1e9
    in_run = (rel_s >= 1.0) & (rel_s < 3.0)
    assert (pdf.loc[in_run, "label"] == "run").all()
    assert pdf.loc[~in_run, "label"].isna().all()


def test_convert_csv_roundtrip(spark, acq_folder, tmp_path):
    folder, _, t = acq_folder
    hsd = Acquisition(spark, folder)
    out = str(tmp_path / "csvout")
    hsd.convert_dat_to_xsv(SENSOR, out, end_time=1.0, file_format="CSV")
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == int((t < 1.0).sum())
    assert "Time" in back.columns and "alias" in back.columns


def test_multi_sensor_acquisition(spark, tmp_path):
    """One acquisition, two components: per-sensor decode params and
    one DataFrame each from load() (reference: one .dat per component,
    get_sensor(hsd, name) selects which, main.py:74)."""
    from gcf_corima_parquet_converter_spark.sources.synthetic import add_sensor

    folder = str(tmp_path / "multi_sensor")
    write_acquisition(folder, n_seconds=2.0)
    add_sensor(folder, "stts22h_temp", dim=1, odr=1000.0, spts=32)

    hsd = Acquisition(spark, folder)
    assert hsd.sensors == [SENSOR, "stts22h_temp"]
    assert hsd.get_sensor("stts22h_temp").params.dim == 1
    assert hsd.get_sensor(SENSOR).params.dim == 3

    frames = hsd.load()
    assert set(frames) == {SENSOR, "stts22h_temp"}
    temp = frames["stts22h_temp"]
    # dim=1 -> one axis column; 2 s at 1000 Hz in 32-sample packets
    axis_cols = [c for c in temp.columns if c not in ("Time", "alias")]
    assert len(axis_cols) == 1
    assert temp.count() == (2000 // 32) * 32
    assert frames[SENSOR].count() == int(2.0 * 2000.0) // 64 * 64


def test_convert_labeled_matches_label_samples_directly(spark, acq_folder, tmp_path):
    """labeled=True parity: the facade's export must equal composing
    load() + tag_intervals() + telemetry.label_samples by hand, row for
    row (same J3 broadcast interval join, same null-label semantics)."""
    import pyspark.sql.functions as F

    from gcf_corima_parquet_converter_spark.operators import telemetry as tm

    folder, _, _ = acq_folder
    hsd = Acquisition(spark, folder)
    out = str(tmp_path / "labeled_export")
    exported = hsd.convert_dat_to_xsv(
        SENSOR, out, labeled=True, file_format="PARQUET"
    )

    # the hand-built equivalent
    meta = hsd.get_sensor(SENSOR)
    df = hsd.load(SENSOR, absolute_time=False)[SENSOR]
    tagdf = spark.createDataFrame(
        [(lbl, float(t0), float(t1)) for lbl, t0, t1 in hsd.tags()],
        "label string, t_start double, t_end double",
    )
    want = tm.to_absolute_time(tm.label_samples(df, tagdf), meta.start_ns)

    assert sorted(exported.columns) == sorted(want.columns)
    key = [c for c in exported.columns]
    a = {tuple(r) for r in exported.select(*key).collect()}
    b = {tuple(r) for r in want.select(*key).collect()}
    assert a == b and len(a) == want.count()
    # and the persisted parquet carries the same labeled rows
    disk = {tuple(r) for r in spark.read.parquet(out).select(*key).collect()}
    assert disk == b
