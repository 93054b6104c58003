"""Local twin of the driver's t2 correctness gate: run a Spark query and
its DuckDB oracle side-by-side and demand EXACT equality (row count,
column names, dtype family, and bit-exact values after sorting).

Stricter than necessary on purpose — if this passes, any reasonable
hash-based comparison the driver does will pass too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_driver_safe_oracle_types(con, sql: str, name: str):
    """The driver hash-compares Arrow values, so a DuckDB HUGEINT/DECIMAL
    (decimal128) oracle column hash-mismatches Spark's BIGINT even when the
    values are equal. _normalize used to mask that locally (int64 coercion) —
    fail loudly instead so the bug class can't survive pytest.
    """
    import pyarrow as pa

    # LIMIT 0 wrapper: only the schema is needed — materializing the
    # full result here doubled oracle cost for every graded query
    # (compare() runs the same SQL again for values).
    schema = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
    bad = [f"{f.name}:{f.type}" for f in schema if pa.types.is_decimal(f.type)]
    assert not bad, (
        f"{name}: oracle SQL yields decimal128/HUGEINT columns {bad} — the "
        f"driver's Arrow hash compare will fail even if values match. "
        f"Wrap the aggregate as CAST(... AS BIGINT/DOUBLE) in the oracle SQL."
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    _assert_driver_safe_oracle_types(con, sql, name)
    s = _normalize(spark_df.toPandas())
    d = _normalize(con.execute(sql).df())
    assert list(s.columns) == list(d.columns), (
        f"{name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}"
    )
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if s[c].dtype.kind == "f":
            ok = (sv == dv) | (np.isnan(sv) & np.isnan(dv))
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {len(bad)} float mismatches, e.g. rows {bad}: "
                    f"spark={sv[bad]} duck={dv[bad]} diff={sv[bad] - dv[bad]}"
                )
        else:
            ok = (s[c].isna().to_numpy() & d[c].isna().to_numpy()) | (sv == dv)
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: mismatches at rows {bad}: "
                    f"spark={sv[bad]} duck={dv[bad]}"
                )
    return len(s)
