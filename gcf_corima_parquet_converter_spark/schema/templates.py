"""Built-in generated DTDL device templates.

The reference ships ~40 appconfig device-template JSONs inside the
stdatalog_pnpl wheel and resolves them by ``(board_id, fw_id)`` through
its catalog index (device_template_manager.py:139-199).  Re-shipping
ST's JSONs verbatim is out (they are the vendor's artifacts); but
templates can be GENERATED from public facts: the DTDL v2 grammar (a
Microsoft standard) plus each sensor's datasheet envelope.  Four
boards ship built-in — the pair the reference pipeline actually
exercises (STEVAL-STWINBX1 / FP-SNS-DATALOG2, whose acceleration
stream is the ``iis3dwb_acc;5`` interface; 26.667 kHz ODR, ±2/4/8/16 g,
3 axes of int16), plus the STWINKT1B (ISM330DHCX acc+gyro + STTS22H
temp), X-NUCLEO-IKS02A1 (ISM330DHCX acc+gyro), and SensorTile.box PRO
(IMP34DT05 digital microphone — the dim=1 high-rate audio shape) built
through the spec-driven ``sensor_interface``/``device_template``
builders.

Everything here is emitted by builder functions — no JSON is copied;
the builders are also the extension point for users to register their
own boards (``materialize`` accepts extra ``(board_id, fw_id,
template)`` triples).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

# DTMI namespace for generated interfaces.  Deliberately OUR OWN
# namespace, not ST's dtmi:vespucci/dtmi:appconfig ids: the template is
# shape-compatible, not the vendor artifact.
_NS = "dtmi:gcfspark:steval_stwinbx1:fp_sns_datalog2"

#: The catalog pair the reference CI exercises: board 0xe is the
#: STEVAL-STWINBX1, fw 0x6 is FP-SNS-DATALOG2 with the ;5 sensor
#: interfaces (wheel catalog row -> Datalog2-6 template).
STWINBX1_BOARD_ID = "0xe"
DATALOG2_FW_ID = "0x6"


def _prop(
    name: str,
    schema: Any,
    *,
    ptype: Any = "Property",
    writable: bool = True,
    unit: str | None = None,
    display: str | None = None,
    initial: Any = None,
    min_value: Any = None,
    max_value: Any = None,
) -> dict:
    """One DTDL Property content node."""
    node: dict = {
        "@id": f"{_NS}:{name};1",
        "@type": ptype,
        "displayName": {"en": display or name},
        "name": name,
        "schema": schema,
        "writable": writable,
    }
    if unit is not None:
        node["unit"] = unit
    if initial is not None:
        node["initialValue"] = initial
    if min_value is not None:
        node["minValue"] = min_value
    if max_value is not None:
        node["maxValue"] = max_value
    return node


def _enum_schema(name: str, values: list[tuple[str, int]]) -> dict:
    return {
        "@id": f"{_NS}:{name}:schema;1",
        "@type": "Enum",
        "displayName": {"en": "Enum"},
        "enumValues": [
            {
                "@id": f"{_NS}:{name}:schema:{vname};1",
                "displayName": {"en": vname},
                "enumValue": v,
                "name": vname,
            }
            for vname, v in values
        ],
        "valueSchema": "integer",
    }


def iis3dwb_acc_interface(version: int = 5) -> dict:
    """The IIS3DWB accelerometer component interface, same property set
    as the reference's ``sensors:iis3dwb_acc;5`` (odr/fs enums; enable;
    samples_per_ts; dim/ioffset/measodr/usb_dps/sd_dps/sensitivity/
    data_type value properties).  Initial values are the datasheet
    defaults so ``initial_status`` yields a decode-ready status."""
    contents = [
        _prop(
            "odr",
            _enum_schema("odr", [("hz26667", 0)]),
            unit="hertz",
            writable=False,
            display="ODR",
        ),
        _prop(
            "fs",
            _enum_schema("fs", [("g2", 0), ("g4", 1), ("g8", 2), ("g16", 3)]),
            unit="gForce",
            display="FS",
        ),
        _prop(
            "enable",
            "boolean",
            ptype=["Property", "BooleanValue"],
            display="Enabled",
            initial=True,
        ),
        _prop(
            "samples_per_ts",
            "integer",
            ptype=["Property", "Initialized", "NumberValue"],
            display="Samples per Timestamp",
            initial=1000,
            min_value=0,
            max_value=1000,
        ),
        _prop(
            "dim",
            "integer",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=3,
        ),
        _prop(
            "ioffset",
            "double",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=0.0,
        ),
        _prop(
            "measodr",
            "double",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=26667.0,
        ),
        _prop(
            "usb_dps",
            "integer",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=0,
        ),
        _prop(
            "sd_dps",
            "integer",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=0,
        ),
        _prop(
            "sensitivity",
            "double",
            ptype=["Property", "NumberValue"],
            writable=False,
            # ±2 g range: 0.061 mg/LSB expressed in g
            initial=0.0000610,
        ),
        _prop(
            "data_type",
            "string",
            ptype=["Property", "StringValue"],
            writable=False,
            initial="int16",
        ),
    ]
    return {
        "@context": ["dtmi:iotcentral:context;2", "dtmi:dtdl:context;2"],
        "@id": f"{_NS}:sensors:iis3dwb_acc;{version}",
        "@type": "Interface",
        "contents": contents,
        "displayName": {"en": "IIS3DWB Accelerometer"},
    }


def stwinbx1_datalog2_template(version: int = 5) -> list[dict]:
    """Root interface + iis3dwb_acc component — the minimal template
    that resolves the reference pipeline's acceleration stream.  Shaped
    like the wheel's templates (a list of interfaces; the root's
    Component contents name their interface by schema @id)."""
    acc = iis3dwb_acc_interface(version)
    root = {
        "@context": ["dtmi:iotcentral:context;2", "dtmi:dtdl:context;2"],
        "@id": f"{_NS};1",
        "@type": "Interface",
        "contents": [
            {
                "@id": f"{_NS}:iis3dwb_acc;1",
                "@type": "Component",
                "displayName": {"en": "iis3dwb_acc"},
                "name": "iis3dwb_acc",
                "schema": acc["@id"],
            }
        ],
        "displayName": {"en": "FP-SNS-DATALOG2 (generated)"},
    }
    return [root, acc]


# ------------------------------------------- spec-driven board builders
#
# The iis3dwb builder above is the hand-written original; these
# generalize it so ANY board is a handful of datasheet facts, proving
# the generated catalog is a builder surface, not a one-off fixture.
# Property @ids are namespaced per component interface (two components
# on one board both have an ``odr`` property; DTDL @ids must be unique).


def sensor_interface(
    comp_name: str,
    *,
    ns: str,
    odr_enum: list[tuple[str, int]],
    measodr: float,
    sensitivity: float,
    fs_enum: list[tuple[str, int]] | None = None,
    fs_unit: str | None = None,
    dim: int = 3,
    data_type: str = "int16",
    samples_per_ts: int = 1000,
    version: int = 1,
    display: str | None = None,
) -> dict:
    """One sensor-component interface from datasheet facts, with the
    same property set the reference's sensor interfaces expose (the
    HSD_DataToolkit.py:45-51 status keys plus converter params)."""
    ins = f"{ns}:sensors:{comp_name}"

    def p(name, schema, **kw):
        node = _prop(name, schema, **kw)
        node["@id"] = f"{ins}:{name};1"
        return node

    def enum(name, values):
        sch = _enum_schema(name, values)
        sch["@id"] = f"{ins}:{name}:schema;1"
        for v, row in zip(values, sch["enumValues"]):
            row["@id"] = f"{ins}:{name}:schema:{v[0]};1"
        return sch

    contents = [
        p("odr", enum("odr", odr_enum), unit="hertz", display="ODR"),
    ]
    if fs_enum is not None:
        contents.append(p("fs", enum("fs", fs_enum), unit=fs_unit, display="FS"))
    contents += [
        p(
            "enable",
            "boolean",
            ptype=["Property", "BooleanValue"],
            display="Enabled",
            initial=True,
        ),
        p(
            "samples_per_ts",
            "integer",
            ptype=["Property", "Initialized", "NumberValue"],
            display="Samples per Timestamp",
            initial=samples_per_ts,
            min_value=0,
            max_value=samples_per_ts,
        ),
        p(
            "dim",
            "integer",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=dim,
        ),
        p(
            "ioffset",
            "double",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=0.0,
        ),
        p(
            "measodr",
            "double",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=measodr,
        ),
        p(
            "usb_dps",
            "integer",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=0,
        ),
        p(
            "sd_dps",
            "integer",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=0,
        ),
        p(
            "sensitivity",
            "double",
            ptype=["Property", "NumberValue"],
            writable=False,
            initial=sensitivity,
        ),
        p(
            "data_type",
            "string",
            ptype=["Property", "StringValue"],
            writable=False,
            initial=data_type,
        ),
    ]
    return {
        "@context": ["dtmi:iotcentral:context;2", "dtmi:dtdl:context;2"],
        "@id": f"{ins};{version}",
        "@type": "Interface",
        "contents": contents,
        "displayName": {"en": display or comp_name},
    }


def device_template(
    ns: str, components: list[tuple[str, dict]], display: str
) -> list[dict]:
    """Root interface + component interfaces — the wheel's template
    shape (a list of interfaces; the root's Component contents name
    their interface by schema @id)."""
    root = {
        "@context": ["dtmi:iotcentral:context;2", "dtmi:dtdl:context;2"],
        "@id": f"{ns};1",
        "@type": "Interface",
        "contents": [
            {
                "@id": f"{ns}:{name};1",
                "@type": "Component",
                "displayName": {"en": name},
                "name": name,
                "schema": iface["@id"],
            }
            for name, iface in components
        ],
        "displayName": {"en": display},
    }
    return [root] + [iface for _, iface in components]


_NS_KT1B = "dtmi:gcfspark:steval_stwinkt1b:fp_sns_datalog2"
_NS_IKS02A1 = "dtmi:gcfspark:x_nucleo_iks02a1:fp_sns_datalog2"
_NS_MKBOXPRO = "dtmi:gcfspark:steval_mkboxpro:fp_sns_datalog2"

#: Second catalog pair: STEVAL-STWINKT1B running FP-SNS-DATALOG2
#: (wheel catalog rows board 0x9).  Components from public datasheets.
STWINKT1B_BOARD_ID = "0x9"
STWINKT1B_FW_ID = "0x4"

#: Third pair: X-NUCLEO-IKS02A1 expansion board (wheel rows board 0x10).
IKS02A1_BOARD_ID = "0x10"
IKS02A1_FW_ID = "0x1"

#: Fourth pair: SensorTile.box PRO — the 1-D high-rate AUDIO stream
#: shape (digital MEMS microphone) the other three boards don't cover.
MKBOXPRO_BOARD_ID = "0xb"
MKBOXPRO_FW_ID = "0x1"

#: Fifth pair: B-U585I-IOT02A discovery kit — FLOAT-native low-ODR
#: environmental sensors (pressure + humidity), the only board shape
#: whose wire samples are float32, not int16 (exercises the float
#: branch of the S4 decode chain end-to-end through the template).
#: Pairing ids are in our namespace (catalog lookup needs uniqueness,
#: not ST's registry values).
U585I_BOARD_ID = "0x7"
U585I_FW_ID = "0x1"
_NS_U585I = "dtmi:gcfspark:b_u585i_iot02a:fp_sns_datalog2"

#: Sixth pair: X-NUCLEO-IKS01A3 expansion board — adds the
#: MAGNETOMETER semantic (3-axis, gauss full-scale) no other builtin
#: board carries.  Pairing ids in our namespace.
IKS01A3_BOARD_ID = "0x8"
IKS01A3_FW_ID = "0x1"
_NS_IKS01A3 = "dtmi:gcfspark:x_nucleo_iks01a3:fp_sns_datalog2"


def _ism330dhcx_acc(ns: str) -> dict:
    # ISM330DHCX datasheet: acc ODR to 6.667 kHz; FS ±2/4/8/16 g;
    # 0.061 mg/LSB at ±2 g; 3 axes of int16
    return sensor_interface(
        "ism330dhcx_acc",
        ns=ns,
        odr_enum=[
            ("hz104", 0),
            ("hz833", 1),
            ("hz1667", 2),
            ("hz3333", 3),
            ("hz6667", 4),
        ],
        measodr=6667.0,
        fs_enum=[("g2", 0), ("g4", 1), ("g8", 2), ("g16", 3)],
        fs_unit="gForce",
        sensitivity=0.0000610,
        display="ISM330DHCX Accelerometer",
    )


def _ism330dhcx_gyro(ns: str) -> dict:
    # ISM330DHCX datasheet: gyro FS ±125..±4000 dps; 4.375 mdps/LSB
    # at ±125 dps; 3 axes of int16
    return sensor_interface(
        "ism330dhcx_gyro",
        ns=ns,
        odr_enum=[
            ("hz104", 0),
            ("hz833", 1),
            ("hz1667", 2),
            ("hz3333", 3),
            ("hz6667", 4),
        ],
        measodr=6667.0,
        fs_enum=[
            ("dps125", 0),
            ("dps250", 1),
            ("dps500", 2),
            ("dps1000", 3),
            ("dps2000", 4),
            ("dps4000", 5),
        ],
        fs_unit="degreePerSecond",
        sensitivity=0.004375,
        display="ISM330DHCX Gyroscope",
    )


def _stts22h_temp(ns: str) -> dict:
    # STTS22H datasheet: 1..200 Hz ODR; 0.01 °C/LSB; single channel
    return sensor_interface(
        "stts22h_temp",
        ns=ns,
        odr_enum=[("hz1", 0), ("hz25", 1), ("hz50", 2), ("hz100", 3), ("hz200", 4)],
        measodr=200.0,
        sensitivity=0.01,
        dim=1,
        samples_per_ts=200,
        display="STTS22H Temperature",
    )


def _imp34dt05_mic(ns: str) -> dict:
    # IMP34DT05-TR datasheet: digital PDM MEMS microphone; the datalog
    # firmware decimates to PCM at 16/32/48 kHz — one channel of int16
    # waveform.  "sensitivity" here is the decode-path normalization
    # int16 -> [-1, 1) full-scale (1/32768); the acoustic sensitivity
    # (-26 dBFS @ 94 dB SPL) lives in the analog domain, not the
    # converter.  dim=1 at 48 kHz is the structural shape that stresses
    # the timestamp framing: samples_per_ts batches thousands of samples
    # per 8-byte stamp, exactly the spts-heavy packet layout of S4.
    return sensor_interface(
        "imp34dt05_mic",
        ns=ns,
        odr_enum=[("hz16000", 0), ("hz32000", 1), ("hz48000", 2)],
        measodr=48000.0,
        sensitivity=1.0 / 32768,
        dim=1,
        data_type="int16",
        samples_per_ts=1000,
        display="IMP34DT05 Microphone",
    )


def _lps22hh_press(ns: str) -> dict:
    # LPS22HH datasheet: barometer, ODR one-shot..200 Hz; the datalog
    # firmware emits float32 hPa directly (24-bit ADC scaling happens
    # on-sensor), so sensitivity is the identity and data_type="float".
    return sensor_interface(
        "lps22hh_press",
        ns=ns,
        odr_enum=[
            ("hz1", 0),
            ("hz10", 1),
            ("hz25", 2),
            ("hz50", 3),
            ("hz75", 4),
            ("hz100", 5),
            ("hz200", 6),
        ],
        measodr=200.0,
        sensitivity=1.0,
        dim=1,
        data_type="float",
        samples_per_ts=200,
        display="LPS22HH Pressure",
    )


def _hts221_hum(ns: str) -> dict:
    # HTS221 datasheet: relative humidity, ODR 1/7/12.5 Hz; float32 %RH
    # out of the firmware, identity sensitivity.
    return sensor_interface(
        "hts221_hum",
        ns=ns,
        odr_enum=[("hz1", 0), ("hz7", 1), ("hz12_5", 2)],
        measodr=12.5,
        sensitivity=1.0,
        dim=1,
        data_type="float",
        samples_per_ts=12,
        display="HTS221 Humidity",
    )


def _lis2mdl_mag(ns: str) -> dict:
    # LIS2MDL datasheet: 3-axis magnetometer, ODR 10/20/50/100 Hz,
    # fixed ±50 gauss range, 1.5 mgauss/LSB — the only sensor class
    # with a gauss-denominated full scale.
    return sensor_interface(
        "lis2mdl_mag",
        ns=ns,
        odr_enum=[("hz10", 0), ("hz20", 1), ("hz50", 2), ("hz100", 3)],
        measodr=100.0,
        fs_enum=[("g50", 0)],
        fs_unit="gauss",
        sensitivity=0.0015,
        samples_per_ts=100,
        display="LIS2MDL Magnetometer",
    )


def iks01a3_datalog2_template() -> list[dict]:
    """X-NUCLEO-IKS01A3: magnetometer + temperature — the gauss-unit
    sensor class plus a cross-board reuse of the STTS22H-style temp
    shape (component interfaces are per-namespace, so reuse is by
    construction, not by reference)."""
    ns = _NS_IKS01A3
    return device_template(
        ns,
        [
            ("lis2mdl_mag", _lis2mdl_mag(ns)),
            ("stts751_temp", _stts751_temp(ns)),
        ],
        "FP-SNS-DATALOG2 on X-NUCLEO-IKS01A3 (generated)",
    )


def _stts751_temp(ns: str) -> dict:
    # STTS751 datasheet: digital temp sensor, conversion rates to 8 Hz
    return sensor_interface(
        "stts751_temp",
        ns=ns,
        odr_enum=[("hz1", 0), ("hz4", 1), ("hz8", 2)],
        measodr=8.0,
        sensitivity=0.0625,
        dim=1,
        samples_per_ts=8,
        display="STTS751 Temperature",
    )


def u585i_datalog2_template() -> list[dict]:
    """B-U585I-IOT02A: pressure + humidity — the float32-wire low-ODR
    environmental board (every other builtin board samples int16)."""
    ns = _NS_U585I
    return device_template(
        ns,
        [
            ("lps22hh_press", _lps22hh_press(ns)),
            ("hts221_hum", _hts221_hum(ns)),
        ],
        "FP-SNS-DATALOG2 on B-U585I-IOT02A (generated)",
    )


def mkboxpro_datalog2_template() -> list[dict]:
    """SensorTile.box PRO: digital microphone — the dim=1 high-rate
    audio board (the IMU shapes are already proven by the other
    boards; this template isolates the audio stream)."""
    ns = _NS_MKBOXPRO
    return device_template(
        ns,
        [("imp34dt05_mic", _imp34dt05_mic(ns))],
        "FP-SNS-DATALOG2 on SensorTile.box PRO (generated)",
    )


def stwinkt1b_datalog2_template() -> list[dict]:
    """STWINKT1B: dual-sensor IMU (acc + gyro) plus temperature — the
    multi-component board shape the single-sensor STWINBX1 template
    does not exercise."""
    ns = _NS_KT1B
    return device_template(
        ns,
        [
            ("ism330dhcx_acc", _ism330dhcx_acc(ns)),
            ("ism330dhcx_gyro", _ism330dhcx_gyro(ns)),
            ("stts22h_temp", _stts22h_temp(ns)),
        ],
        "FP-SNS-DATALOG2 on STWIN.box KT1B (generated)",
    )


def iks02a1_datalog2_template() -> list[dict]:
    """X-NUCLEO-IKS02A1 expansion board: ISM330DHCX acc + gyro."""
    ns = _NS_IKS02A1
    return device_template(
        ns,
        [
            ("ism330dhcx_acc", _ism330dhcx_acc(ns)),
            ("ism330dhcx_gyro", _ism330dhcx_gyro(ns)),
        ],
        "FP-SNS-DATALOG2 on X-NUCLEO-IKS02A1 (generated)",
    )


def initial_status(interface: dict) -> dict:
    """``{property -> initialValue}`` for every Property carrying one —
    the decode-ready status of a freshly-booted component (feed to
    ``dtdl.decode_params_from_status``)."""
    out = {}
    for c in interface.get("contents", []):
        if "initialValue" in c and "name" in c:
            out[c["name"]] = c["initialValue"]
    return out


#: (board_id, fw_id, template_name, builder) rows materialized into the
#: built-in catalog: the pair the reference CI exercises plus two more
#: generated boards (dual-IMU + temp; expansion board), proving the
#: catalog generalizes past a single hand-built fixture.
BUILTIN_TEMPLATES: list[tuple[str, str, str, Any]] = [
    (
        STWINBX1_BOARD_ID,
        DATALOG2_FW_ID,
        "stwinbx1_fp_sns_datalog2-6",
        stwinbx1_datalog2_template,
    ),
    (
        STWINKT1B_BOARD_ID,
        STWINKT1B_FW_ID,
        "stwinkt1b_fp_sns_datalog2-1",
        stwinkt1b_datalog2_template,
    ),
    (
        IKS02A1_BOARD_ID,
        IKS02A1_FW_ID,
        "x_nucleo_iks02a1_fp_sns_datalog2-1",
        iks02a1_datalog2_template,
    ),
    (
        MKBOXPRO_BOARD_ID,
        MKBOXPRO_FW_ID,
        "steval_mkboxpro_fp_sns_datalog2-1",
        mkboxpro_datalog2_template,
    ),
    (
        U585I_BOARD_ID,
        U585I_FW_ID,
        "b_u585i_iot02a_fp_sns_datalog2-1",
        u585i_datalog2_template,
    ),
    (
        IKS01A3_BOARD_ID,
        IKS01A3_FW_ID,
        "x_nucleo_iks01a3_fp_sns_datalog2-1",
        iks01a3_datalog2_template,
    ),
]

_BUILTIN_DIR: str | None = None


def materialize(
    catalog_dir: str | None = None,
    extra: list[tuple[str, str, str, Any]] | None = None,
):
    """Write the generated templates + index into ``catalog_dir`` and
    return a :class:`..schema.dtdl.DeviceTemplateCatalog` over it.  With
    no dir, a per-process cached temp dir is used (idempotent — repeat
    calls reuse it).  ``extra`` rows extend the catalog with caller
    templates (board_id, fw_id, name, template-or-builder)."""
    global _BUILTIN_DIR
    from .dtdl import DeviceTemplateCatalog

    if catalog_dir is None and extra is None and _BUILTIN_DIR is not None:
        return DeviceTemplateCatalog(_BUILTIN_DIR)
    cache_default = catalog_dir is None and extra is None
    if catalog_dir is None:
        catalog_dir = tempfile.mkdtemp(prefix="gcfspark_dtdl_catalog_")

    rows = list(BUILTIN_TEMPLATES) + list(extra or [])
    index = []
    for board_id, fw_id, name, template in rows:
        if callable(template):
            template = template()
        rel = os.path.join("dtmi", "appconfig", name + ".json")
        target = os.path.join(catalog_dir, rel)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        with open(target, "w") as f:
            json.dump(template, f, indent=1)
        index.append(
            {
                "board_id": board_id,
                "fw_id": fw_id,
                "az_cloud_dtmi": "",
                "st_cloud_dtmi": "",
                "local_dtmi": rel,
            }
        )
    cat = DeviceTemplateCatalog(catalog_dir)
    cat._write_index(index)
    if cache_default:
        _BUILTIN_DIR = catalog_dir
    return cat
