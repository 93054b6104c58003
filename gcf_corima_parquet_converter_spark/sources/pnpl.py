"""PnPL command builders — the control-plane message constructors a
device-facing deployment sends alongside the data plane (SURVEY §2.11;
reference: stdatalog_pnpl PnPLCmd.py:34-114).

These are pure driver-side JSON builders with no Spark dependency:
the engine itself never talks to devices, but a pipeline that triggers
acquisitions (S1 event-triggered source) needs to EMIT these commands,
and keeping the wire format here completes the reference's API surface.

Wire format parity:
* presentation / identity / status getters are single-key objects
  (``{"get_presentation": ""}`` etc.);
* ``set_property`` nests a value under ``component.prop`` — a property
  PATH (list of keys) nests arbitrarily deep;
* ``command`` uses the ``component*command`` compound key; a request
  payload that is itself a single-entry dict is inlined, anything else
  is wrapped under the request name (PnPLCmd.py:84-114).
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Any


def get_presentation_cmd() -> str:
    return json.dumps({"get_presentation": ""})


def get_identity_cmd() -> str:
    return json.dumps({"get_identity": ""})


def get_device_status_cmd() -> str:
    return json.dumps({"get_status": "all"})


def get_component_status_cmd(comp_name: str) -> str:
    return json.dumps({"get_status": comp_name})


def set_property_cmd(
    comp_name: str, prop_name: str | list[str], prop_value: Any
) -> str:
    """``{comp: {prop: value}}``; a list prop_name is a nested path:
    ``set_property_cmd("acc", ["odr", "hz"], 100)`` ->
    ``{"acc": {"odr": {"hz": 100}}}``."""
    if isinstance(prop_name, str):
        path = [prop_name]
    else:
        if not prop_name:
            raise ValueError("empty property path")
        path = list(prop_name)
    nested = reduce(lambda v, key: {key: v}, reversed(path), prop_value)
    return json.dumps({comp_name: nested})


def command_cmd(
    comp_name: str,
    command_name: str,
    req_name: str | None = None,
    req_value: Any = None,
) -> str:
    """``{"comp*cmd": payload}``.  Payload shapes (PnPLCmd.py:84-114):
    no request -> ``""``; bare value without a request name -> the
    value; a named request -> ``{req_name: req_value}``, EXCEPT that a
    single-entry dict value is already a complete request object and is
    inlined as-is."""
    key = f"{comp_name}*{command_name}"
    if req_name is None:
        payload: Any = req_value if req_value is not None else ""
    elif isinstance(req_value, dict) and len(req_value) == 1:
        payload = req_value
    else:
        payload = {req_name: req_value}
    return json.dumps({key: payload})
