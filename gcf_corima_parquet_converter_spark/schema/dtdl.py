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

import json
import os
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.dat import DecodeParams

# DTDL primitive schema -> Spark type (device_template_model.py:106-110
# carries the first four; the rest complete the DTDL v2 primitive set —
# all appear across the public appconfig catalog).  "vector" is the
# stdatalog extension for JSON-valued lists (tag lists: the template
# annotates it "JSON Value"): surfaced as array<string> of JSON items —
# parse element-wise with from_json downstream.
_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "double": DoubleType(),
    "integer": IntegerType(),
    "string": StringType(),
    "float": DoubleType(),  # float32 wire, float64 column (decode conv.)
    "long": LongType(),
    "date": StringType(),  # ISO strings in status docs; cast downstream
    "dateTime": StringType(),
    "time": StringType(),
    "duration": StringType(),
    "vector": ArrayType(StringType()),
}

# DTDL semantic unit name -> display symbol (parity with the reference's
# UnitMap, stdatalog_pnpl DTDL/dtdl_utils.py:23-39).  Values and schemas
# never depend on this — it is display metadata, carried on StructField
# metadata so sinks/UIs can format columns per the template's ``unit``
# annotation.
UNIT_DISPLAY: dict[str, str] = {
    "gForce": "g",
    "gauss": "G",
    "decibel": "dB",
    "degreePerSecond": "dps",
    "mdps": "mdps",
    "degreeCelsius": "°C",
    "hertz": "Hz",
    "second": "s",
    "Waveform": "Waveform",
    "percent": "%",
    "millisecond": "ms",
    "microsecond": "μs",
}


def unit_display(unit) -> str:
    """Display symbol for a DTDL semantic unit name; unknown units pass
    through unchanged (so already-symbolic strings like ``"g"`` are
    stable under re-application).  Localized-string objects
    (``{"en": "g"}``) and other non-string shapes — both appear in the
    public appconfig catalog — reduce to their display text first."""
    if isinstance(unit, dict):
        unit = unit.get("en") or next(iter(unit.values()), "")
    if not isinstance(unit, str):
        unit = str(unit)
    return UNIT_DISPLAY.get(unit, unit)


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
    component-status document shape).

    A content's ``unit``/``displayUnit`` semantic annotation (DTDL v2
    semantic types) is surfaced as StructField metadata
    ``{"unit": <dtdl name>, "unit_symbol": <display symbol>}`` — the
    repo analogue of the reference's UnitMap display layer."""
    fields = []
    for c in interface.get("contents", []):
        ctype = c.get("@type")
        if isinstance(ctype, list):
            is_prop = "Property" in ctype
        else:
            is_prop = ctype == "Property"
        if not is_prop:
            continue
        unit = c.get("unit") or c.get("displayUnit")
        meta = {"unit": unit, "unit_symbol": unit_display(unit)} if unit else None
        fields.append(
            StructField(c["name"], dtdl_schema_to_spark(c["schema"]), metadata=meta)
        )
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
    column style ``A_x [g]`` (sanitized downstream, main.py:87-96);
    ``unit`` accepts either a display symbol or a DTDL semantic unit
    name (``gForce`` -> ``g`` via ``unit_display``)."""
    unit = unit_display(unit)
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


# ------------------------------------------------ device-template catalog


def _hex_id(v: int | str) -> str:
    """Catalog ids are lowercase hex strings ('0x10'); ints are hexed the
    way the reference's add path does (device_template_manager.py:101-103)."""
    return hex(v) if isinstance(v, int) else str(v).lower()


class DeviceTemplateCatalog:
    """File-backed ``(board_id, fw_id) -> device template`` resolution —
    parity with the reference's DeviceTemplateManager catalog statics
    (stdatalog_pnpl DTDL/device_template_manager.py:100-199):

    * ``query(board_id, fw_id)``: for every catalog entry matching the
      pair, a non-empty ``custom_dtmi`` OVERRIDES ``local_dtmi``
      (query_dtdl_model:139-160).  Exactly one hit returns the parsed
      template JSON; several hits return ``{dtmi_path: template}``;
      none returns ``None`` (the reference returns ``""`` — None is the
      Pythonic spelling of the same sentinel).
    * ``add_custom(board_id, fw_id, name, template)``: updates the
      matching entry's ``custom_dtmi`` (or appends a new entry) and
      writes the model file (add_dtdl_model:100-136).
    * ``remove_custom(board_id, fw_id)``: deletes the custom model file
      and clears the override, restoring the base template
      (remove_custom_dtdl_model:85-98).

    The catalog is tiny driver-side state (a JSON index plus KB-scale
    template files); the resolved StructType is then applied to the
    distributed scan — schema resolution never touches executors.
    """

    INDEX = "usb_device_catalog.json"

    def __init__(self, catalog_dir: str):
        self.catalog_dir = catalog_dir
        self.index_path = os.path.join(catalog_dir, self.INDEX)

    @classmethod
    def builtin(cls) -> "DeviceTemplateCatalog":
        """The generated built-in catalog (``schema.templates``): the
        STWINBX1/FP-SNS-DATALOG2 pair the reference pipeline exercises
        plus the STWINKT1B and X-NUCLEO-IKS02A1 boards resolve
        out-of-the-box — no hand-seeded catalog required."""
        from .templates import materialize

        return materialize()

    # -- index I/O ----------------------------------------------------
    def _read_index(self) -> list[dict]:
        if not os.path.exists(self.index_path):
            return []
        with open(self.index_path) as f:
            return json.load(f)

    def _write_index(self, entries: list[dict]) -> None:
        os.makedirs(self.catalog_dir, exist_ok=True)
        with open(self.index_path, "w") as f:
            json.dump(entries, f, indent=4)

    def _load_model(self, dtmi_path: str):
        p = dtmi_path
        if not os.path.isabs(p):
            p = os.path.join(self.catalog_dir, p)
        with open(p) as f:
            return json.load(f)

    # -- reference-parity API ----------------------------------------
    def query(self, board_id: int | str, fw_id: int | str):
        b, w = _hex_id(board_id), _hex_id(fw_id)
        dtmi_paths = []
        for entry in self._read_index():
            if _hex_id(entry.get("board_id", "")) != b:
                continue
            if _hex_id(entry.get("fw_id", "")) != w:
                continue
            if entry.get("custom_dtmi"):
                dtmi_paths.append(entry["custom_dtmi"])
            elif entry.get("local_dtmi"):
                dtmi_paths.append(entry["local_dtmi"])
        if not dtmi_paths:
            return None
        if len(dtmi_paths) == 1:
            return self._load_model(dtmi_paths[0])
        return {p: self._load_model(p) for p in dtmi_paths}

    def add_custom(
        self,
        board_id: int | str,
        fw_id: int | str,
        model_name: str,
        template_json,
    ) -> str:

        b, w = _hex_id(board_id), _hex_id(fw_id)
        rel = os.path.join("dtmi", "custom", os.path.basename(model_name) + ".json")
        entries = self._read_index()
        for entry in entries:
            if (
                _hex_id(entry.get("board_id", "")) == b
                and _hex_id(entry.get("fw_id", "")) == w
            ):
                entry["custom_dtmi"] = rel
                break
        else:
            entries.append({"board_id": b, "fw_id": w, "custom_dtmi": rel})
        target = os.path.join(self.catalog_dir, rel)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        with open(target, "w") as f:
            json.dump(template_json, f)
        self._write_index(entries)
        return rel

    def remove_custom(self, board_id: int | str, fw_id: int | str) -> None:
        b, w = _hex_id(board_id), _hex_id(fw_id)
        entries = self._read_index()
        for entry in entries:
            if (
                _hex_id(entry.get("board_id", "")) == b
                and _hex_id(entry.get("fw_id", "")) == w
                and entry.get("custom_dtmi")
            ):
                p = entry["custom_dtmi"]
                if not os.path.isabs(p):
                    p = os.path.join(self.catalog_dir, p)
                if os.path.exists(p):
                    os.remove(p)
                entry["custom_dtmi"] = ""
        self._write_index(entries)

    # -- generic appconfig import ------------------------------------
    @staticmethod
    def validate_appconfig(template) -> dict[str, dict]:
        """Validate a device-template document in the public appconfig
        shape (a JSON LIST of DTDL v2 Interface objects; the root
        interface's contents are Components whose ``schema`` names a
        sibling interface — device_template_manager.py:36-61 semantics)
        and return its resolved ``{component -> interface}`` map.

        Raises ``ValueError`` with a specific reason on malformed input
        — the importer's contract is "any wheel-shaped appconfig JSON
        loads or you are told why not".
        """
        if isinstance(template, dict):
            template = [template]
        if not isinstance(template, list) or not template:
            raise ValueError("appconfig template must be a non-empty JSON list "
                             "of DTDL Interface objects")
        ifaces = [d for d in template if isinstance(d, dict) and "contents" in d]
        if not ifaces:
            raise ValueError("no Interface objects with 'contents' found")
        comps = find_components(template)
        if not comps:
            raise ValueError(
                "no resolvable Components: the root interface must list "
                "Component contents whose 'schema' ids match sibling "
                "interface '@id's"
            )
        # every component interface must produce a (possibly empty)
        # StructType without raising — fail at import, not at scan time
        for name, iface in comps.items():
            try:
                interface_to_structtype(iface)
            except ValueError as e:
                raise ValueError(f"component {name!r}: {e}") from None
        return comps

    def add_appconfig(
        self,
        template_path: str,
        board_id: int | str,
        fw_id: int | str,
        name: str | None = None,
    ) -> str:
        """Import ONE appconfig template JSON (any of the ~39 public
        board files, or a generated one) into this catalog under
        ``(board_id, fw_id)`` as its ``local_dtmi``.  One importer
        covers every board — no per-board code.  Returns the relative
        dtmi path registered."""
        with open(template_path) as f:
            template = json.load(f)
        self.validate_appconfig(template)
        b, w = _hex_id(board_id), _hex_id(fw_id)
        base = name or os.path.splitext(os.path.basename(template_path))[0]
        rel = os.path.join("dtmi", "appconfig", base + ".json")
        target = os.path.join(self.catalog_dir, rel)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        with open(target, "w") as f:
            json.dump(template, f, indent=1)
        entries = self._read_index()
        for entry in entries:
            if (
                _hex_id(entry.get("board_id", "")) == b
                and _hex_id(entry.get("fw_id", "")) == w
            ):
                entry["local_dtmi"] = rel
                break
        else:
            entries.append(
                {
                    "board_id": b,
                    "fw_id": w,
                    "az_cloud_dtmi": "",
                    "st_cloud_dtmi": "",
                    "local_dtmi": rel,
                }
            )
        self._write_index(entries)
        return rel

    def import_appconfig_tree(self, src_dir: str) -> int:
        """Bulk-import a wheel-shaped DTDL directory — an
        ``usb_device_catalog.json`` index next to ``dtmi/appconfig/**``
        template files — merging every resolvable entry into this
        catalog.  Existing ``custom_dtmi`` overrides here are preserved
        (only ``local_dtmi`` is refreshed).  Returns the number of
        entries imported; entries whose template file is missing or
        malformed are skipped (import what resolves, report the rest
        via the count)."""
        src_index = os.path.join(src_dir, self.INDEX)
        with open(src_index) as f:
            src_entries = json.load(f)
        n = 0
        for e in src_entries:
            rel = e.get("local_dtmi")
            if not rel:
                continue
            path = os.path.join(src_dir, rel)
            try:
                with open(path) as f:
                    template = json.load(f)
                self.validate_appconfig(template)
            except (OSError, ValueError, json.JSONDecodeError):
                continue
            name = os.path.splitext(os.path.basename(rel))[0]
            # flatten the source's board subdirectory into the name so
            # two boards sharing a template file name don't collide
            sub = os.path.dirname(rel)
            for strip in ("dtmi/appconfig", "dtmi"):
                if sub.startswith(strip):
                    sub = sub[len(strip):].strip("/")
                    break
            if sub:
                name = sub.replace("/", "_") + "_" + name
            self.add_appconfig(path, e["board_id"], e["fw_id"], name=name)
            n += 1
        return n

    @classmethod
    def from_appconfig(
        cls,
        catalog_dir: str,
        template_path: str,
        board_id: int | str,
        fw_id: int | str,
        name: str | None = None,
    ) -> "DeviceTemplateCatalog":
        """Bootstrap a catalog directory from one appconfig template
        file (the 'I have a board the builtin catalog doesn't generate'
        path): validate, copy, index, return the live catalog."""
        cat = cls(catalog_dir)
        cat.add_appconfig(template_path, board_id, fw_id, name=name)
        return cat

    # -- Spark-side resolution ---------------------------------------
    def resolve_structtypes(
        self, board_id: int | str, fw_id: int | str
    ) -> dict[str, StructType] | None:
        """Resolve the pair straight to ``{component -> StructType}``
        (catalog hit -> find_components -> interface_to_structtype);
        None on a catalog miss."""
        template = self.query(board_id, fw_id)
        if template is None:
            return None
        if isinstance(template, dict) and "@id" not in template:
            # multiple dtmi hits: first in catalog order wins for schema
            template = next(iter(template.values()))
        return {
            name: interface_to_structtype(iface)
            for name, iface in find_components(template).items()
        }


# --------------------------------------------- semantic annotations


def content_constraints(interface: dict) -> dict[str, dict]:
    """Per-Property semantic annotations from a DTDL interface —
    ``minValue``/``maxValue`` (Integer/Double), ``decimalPlaces``
    (Double), ``minLength``/``maxLength``/``trimWhitespace`` (String)
    and Enum value sets (device_template_model.py:338-389 carries
    exactly these fields).  Returns ``{column -> constraint dict}``
    with only the annotations actually present."""
    out: dict[str, dict] = {}
    for c in interface.get("contents", []):
        ctype = c.get("@type")
        is_prop = (
            "Property" in ctype if isinstance(ctype, list) else ctype == "Property"
        )
        if not is_prop or "name" not in c:
            continue
        cons: dict = {}
        for src, dst in (
            ("minValue", "min_value"),
            ("maxValue", "max_value"),
            ("decimalPlaces", "decimal_places"),
            ("minLength", "min_length"),
            ("maxLength", "max_length"),
            ("trimWhitespace", "trim_whitespace"),
        ):
            if c.get(src) is not None:
                cons[dst] = c[src]
        schema = c.get("schema")
        if isinstance(schema, dict):
            stype = schema.get("@type")
            if isinstance(stype, list):
                stype = stype[0]
            if stype == "Enum":
                cons["enum_values"] = [
                    v.get("enumValue") for v in schema.get("enumValues", [])
                ]
        if cons:
            out[c["name"]] = cons
    return out


def validate_constraints(
    df,
    interface: dict,
    mode: str = "flag",
    violations_col: str = "_violations",
):
    """Apply a DTDL interface's semantic annotations to a DataFrame as
    pure built-in expressions (JVM-side; the check scales with the scan).

    Modes:
      * ``flag``   — append ``violations_col: array<string>`` naming
        every failed check per row (empty array = clean row).
      * ``filter`` — keep only clean rows.
      * ``reject`` — keep only violating rows (the data-quality
        quarantine side of the same split).
      * ``enforce`` — REPAIR what the annotations define as repairable
        (trimWhitespace -> trim, decimalPlaces -> round) and then flag
        the remaining violations.
    """
    import pyspark.sql.functions as F

    if mode not in ("flag", "filter", "reject", "enforce"):
        raise ValueError(f"unknown mode {mode!r}")
    cons = content_constraints(interface)
    cons = {k: v for k, v in cons.items() if k in df.columns}

    if mode == "enforce":
        for name, c in cons.items():
            if c.get("trim_whitespace"):
                df = df.withColumn(name, F.trim(F.col(name)))
            if c.get("decimal_places") is not None:
                df = df.withColumn(name, F.round(F.col(name), c["decimal_places"]))

    checks = []
    for name, c in cons.items():
        col = F.col(name)
        scol = F.trim(col) if (c.get("trim_whitespace") and mode != "enforce") else col
        if c.get("min_value") is not None:
            checks.append((f"{name}<minValue", col < F.lit(c["min_value"])))
        if c.get("max_value") is not None:
            checks.append((f"{name}>maxValue", col > F.lit(c["max_value"])))
        if c.get("decimal_places") is not None and mode != "enforce":
            checks.append(
                (
                    f"{name}!decimalPlaces",
                    F.round(col, c["decimal_places"]) != col,
                )
            )
        if c.get("min_length") is not None:
            checks.append((f"{name}<minLength", F.length(scol) < c["min_length"]))
        if c.get("max_length") is not None:
            checks.append((f"{name}>maxLength", F.length(scol) > c["max_length"]))
        if c.get("enum_values"):
            checks.append(
                (f"{name}!enum", ~col.isin(*[v for v in c["enum_values"]]))
            )

    # NULL values compare to NULL -> when() yields NULL -> array_compact
    # drops it: nulls are "clean" here (SQL three-valued semantics);
    # nullability itself is the schema's job, not an annotation's.
    viol = (
        F.array_compact(
            F.array(*[F.when(cond, F.lit(label)) for label, cond in checks])
        )
        if checks
        else F.array().cast("array<string>")
    )

    flagged = df.withColumn(violations_col, viol)
    if mode in ("flag", "enforce"):
        return flagged
    if mode == "filter":
        return flagged.where(F.size(violations_col) == 0).drop(violations_col)
    return flagged.where(F.size(violations_col) > 0)
