"""PnPL command-builder wire-format parity (PnPLCmd.py:34-114)."""

import json

import pytest

from gcf_corima_parquet_converter_spark.sources import pnpl


def test_getter_commands():
    assert json.loads(pnpl.get_presentation_cmd()) == {"get_presentation": ""}
    assert json.loads(pnpl.get_identity_cmd()) == {"get_identity": ""}
    assert json.loads(pnpl.get_device_status_cmd()) == {"get_status": "all"}
    assert json.loads(pnpl.get_component_status_cmd("acc")) == {"get_status": "acc"}


def test_set_property_flat_and_nested_path():
    assert json.loads(pnpl.set_property_cmd("acc", "odr", 104)) == {
        "acc": {"odr": 104}
    }
    assert json.loads(pnpl.set_property_cmd("acc", ["odr", "hz"], 100)) == {
        "acc": {"odr": {"hz": 100}}
    }
    assert json.loads(
        pnpl.set_property_cmd("log", ["a", "b", "c"], True)
    ) == {"log": {"a": {"b": {"c": True}}}}
    with pytest.raises(ValueError):
        pnpl.set_property_cmd("acc", [], 1)


def test_command_payload_shapes():
    assert json.loads(pnpl.command_cmd("log", "start")) == {"log*start": ""}
    assert json.loads(pnpl.command_cmd("log", "start", req_value=5)) == {
        "log*start": 5
    }
    assert json.loads(
        pnpl.command_cmd("log", "save", "file", "a.dat")
    ) == {"log*save": {"file": "a.dat"}}
    # single-entry dict request is inlined as-is
    assert json.loads(
        pnpl.command_cmd("log", "save", "req", {"file": "a.dat"})
    ) == {"log*save": {"file": "a.dat"}}
    # multi-entry dict is wrapped under the request name
    assert json.loads(
        pnpl.command_cmd("log", "save", "req", {"a": 1, "b": 2})
    ) == {"log*save": {"req": {"a": 1, "b": 2}}}
