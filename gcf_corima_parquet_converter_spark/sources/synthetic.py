"""Synthetic HSDatalog2 acquisition generator (FIXTURES.md §3-4):
deterministic ``.dat`` byte streams + the two metadata JSONs — used by
tests and the q32 end-to-end pipeline query as ground-truth input."""

from __future__ import annotations

import json
import os
import struct

import numpy as np

SENSOR = "iis3dwb_acc"


def make_dat_bytes(
    n_seconds: float = 5.5,
    odr: float = 2000.0,
    spts: int = 64,
    dim: int = 3,
    sensitivity: float = 0.000061,
    data_type: str = "int16",
    seed: int = 11,
    trailing_garbage: int = 0,
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Packets of spts*dim samples + trailing <f8 timestamp; returns
    (bytes, samples_in_g (n,dim) float64, per-sample times)."""
    rng = np.random.default_rng(seed)
    n_packets = int(n_seconds * odr) // spts
    n = n_packets * spts
    t = np.arange(n) / odr
    sig = np.stack(
        [
            np.sin(2 * np.pi * 7 * t) * 0.5,
            np.cos(2 * np.pi * 3 * t) * 0.25,
            np.ones(n),
        ],
        axis=1,
    )[:, :dim] + rng.normal(0, 0.05, (n, dim))
    if data_type == "int16":
        raw = np.clip(np.rint(sig / sensitivity), -32768, 32767).astype(np.int16)
    elif data_type in ("float", "float32"):
        # float-wire sensors (pressure/humidity boards) ship engineering
        # units directly; sensitivity is usually 1.0
        raw = (sig / sensitivity).astype(np.float32)
    else:
        raise ValueError(f"make_dat_bytes: unsupported data_type {data_type!r}")
    in_g = raw.astype(np.float64) * sensitivity
    out = bytearray()
    for p in range(n_packets):
        out += raw[p * spts : (p + 1) * spts].tobytes()  # interleaved rows
        ts = (p * spts + spts - 1) / odr  # stamp = last sample's time
        out += struct.pack("<d", ts)
    if trailing_garbage:
        out += b"\x00" * trailing_garbage
    return bytes(out), in_g, t


def write_acquisition(
    folder: str,
    start_time: str = "2025-07-11T16:22:17.000Z",
    alias: str = "LAF1",
    incomplete: bool = False,
    tags: list | None = None,
    **dat_kw,
) -> tuple[np.ndarray, np.ndarray]:
    os.makedirs(folder, exist_ok=True)
    data, in_g, t = make_dat_bytes(**dat_kw)
    odr = dat_kw.get("odr", 2000.0)
    spts = dat_kw.get("spts", 64)
    sens = dat_kw.get("sensitivity", 0.000061)
    dim = dat_kw.get("dim", 3)
    with open(os.path.join(folder, "acquisition_info.json"), "w") as f:
        json.dump(
            {
                "name": os.path.basename(folder),
                "description": "synthetic fixture",
                "uuid": "00000000-0000-0000-0000-000000000001",
                "start_time": start_time,
                "end_time": "",
                "data_ext": ".dat",
                "data_fmt": "HSD_2.0.0",
                "tags": tags or [],
                "interface": 0,
                "schema_version": "2.0.0",
            },
            f,
        )
    with open(os.path.join(folder, "device_config.json"), "w") as f:
        json.dump(
            {
                "device": {
                    "components": [
                        {"firmware_info": {"alias": alias}},
                        {
                            SENSOR: {
                                "odr": odr,
                                "fs": 16.0,
                                "enable": True,
                                "samples_per_ts": spts,
                                "dim": dim,
                                "sensitivity": sens,
                                "data_type": "int16",
                            }
                        },
                    ]
                }
            },
            f,
        )
    if not incomplete:
        with open(os.path.join(folder, f"{SENSOR}.dat"), "wb") as f:
            f.write(data)
    return in_g, t


def add_sensor(
    folder: str,
    name: str,
    odr: float = 1000.0,
    spts: int = 32,
    dim: int = 1,
    sensitivity: float = 0.001,
    seed: int = 23,
    n_seconds: float = 2.0,
    data_type: str = "int16",
) -> np.ndarray:
    """Add a second component to an existing acquisition: write
    ``<name>.dat`` and register its decode params in
    device_config.json (acquisitions hold one .dat per component)."""
    data, in_g, _t = make_dat_bytes(
        n_seconds=n_seconds, odr=odr, spts=spts, dim=dim,
        sensitivity=sensitivity, seed=seed, data_type=data_type,
    )
    with open(os.path.join(folder, f"{name}.dat"), "wb") as f:
        f.write(data)
    cfg_path = os.path.join(folder, "device_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["device"]["components"].append(
        {
            name: {
                "odr": odr,
                "enable": True,
                "samples_per_ts": spts,
                "dim": dim,
                "sensitivity": sensitivity,
                "data_type": data_type,
            }
        }
    )
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return in_g
