"""DTDL v2 schema resolution: device template JSON -> Spark StructType
+ per-component decode parameters.

The reference resolves schemas from DTDL device templates shipped with
the acquisition (SURVEY §1.3; stdatalog_pnpl DTDL/device_template_
manager.py:36-64 builds {component -> interface}; HSD_DataToolkit.py:
45-51 pulls dim/data_type/samples_per_ts from component status).  Here
the same resolution is a pure driver-side function producing Spark
types — built once at plan time, never inferred from data.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..sources.dat import DecodeParams

# DTDL primitive schema -> Spark type (device_template_model.py:106-110)
_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "double": DoubleType(),
    "integer": IntegerType(),
    "string": StringType(),
}


def dtdl_schema_to_spark(schema: Any) -> DataType:
    """Convert one DTDL schema node (primitive name, Enum, Object,
    Array) into a Spark DataType."""
    if isinstance(schema, str):
        try:
            return _PRIMITIVES[schema]
        except KeyError:
            raise ValueError(f"unsupported DTDL primitive {schema!r}") from None
    stype = schema.get("@type")
    if isinstance(stype, list):
        stype = stype[0]
    if stype == "Enum":
        # enum value schema is int or string; surface the VALUE type
        vs = schema.get("valueSchema", "integer")
        return _PRIMITIVES.get(vs, StringType())
    if stype == "Object":
        return StructType(
            [
                StructField(f["name"], dtdl_schema_to_spark(f["schema"]))
                for f in schema.get("fields", [])
            ]
        )
    if stype == "Array":
        return ArrayType(dtdl_schema_to_spark(schema.get("elementSchema", "double")))
    raise ValueError(f"unsupported DTDL schema node {stype!r}")


def interface_to_structtype(interface: dict) -> StructType:
    """DTDL Interface -> StructType over its Property contents (the
    component-status document shape)."""
    fields = []
    for c in interface.get("contents", []):
        ctype = c.get("@type")
        if isinstance(ctype, list):
            is_prop = "Property" in ctype
        else:
            is_prop = ctype == "Property"
        if not is_prop:
            continue
        fields.append(StructField(c["name"], dtdl_schema_to_spark(c["schema"])))
    return StructType(fields)


def find_components(template: list | dict) -> dict[str, dict]:
    """{component_name -> interface} from a device template (mirrors
    DeviceTemplateManager: root interface = the one whose contents are
    Components; each Component's schema @id names its interface)."""
    interfaces = template if isinstance(template, list) else [template]
    by_id = {i["@id"]: i for i in interfaces if "@id" in i}
    comps: dict[str, dict] = {}
    for iface in interfaces:
        for c in iface.get("contents", []):
            ctype = c.get("@type")
            if ctype == "Component" or (
                isinstance(ctype, list) and "Component" in ctype
            ):
                schema_id = c.get("schema")
                if isinstance(schema_id, str) and schema_id in by_id:
                    comps[c["name"]] = by_id[schema_id]
    return comps


def decode_params_from_status(
    status: dict, axis_prefix: str = "A", unit: str = "g"
) -> DecodeParams:
    """Component-status dict -> DecodeParams (HSD_DataToolkit.py:45-51
    key set: dim, data_type, samples_per_ts; plus sensitivity/odr used
    by the converter).  Axis naming follows the reference's decoded
    column style ``A_x [g]`` (sanitized downstream, main.py:87-96)."""
    dim = int(status.get("dim", 1))
    letters = ["x", "y", "z"] + [f"d{i}" for i in range(3, dim)]
    names = tuple(f"{axis_prefix}_{letters[i]} [{unit}]" for i in range(dim))
    return DecodeParams(
        dim=dim,
        data_type=status.get("data_type", "int16"),
        samples_per_ts=int(status.get("samples_per_ts", 1)),
        sensitivity=float(status.get("sensitivity", 1.0)),
        odr=float(status.get("odr", 26667.0)),
        axis_names=names,
    )
