"""Column-name sanitizer (reference parity: main.py:87-96).

The reference renames every decoded column with a fixed substitution
chain so unit-annotated names like ``A_x [g]`` become ``A_x_g``.  Names
are plan-time metadata, so this is pure Python applied via ``toDF`` —
no row-level work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Ordered (old, new) substitutions; order matters: "(g)" must be dropped
# before bare "," handling, exactly like the reference chain.
_SUBS = (
    (" ", "_"),
    ("[", ""),
    ("]", ""),
    ("(g)", ""),
    ("{g}", ""),
    ("/g", ""),
    ("°", "deg"),
    (",", "_"),
)


def sanitize_name(name: str) -> str:
    for old, new in _SUBS:
        name = name.replace(old, new)
    return name


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through the sanitizer (operator P1)."""
    return df.toDF(*[sanitize_name(c) for c in df.columns])


def conform_schema(
    df: DataFrame,
    target,
    on_extra: str = "drop",
    strict_casts: bool = True,
) -> DataFrame:
    """Conform ``df`` to a target ``StructType`` — the append-side of
    schema evolution: heterogeneous batches (older producers, renamed
    exports, partial columns) become writable into one canonical table.

    Per target field: present -> cast to the target type (``try_cast``
    unless ``strict_casts``, where an incompatible cast is a plan-time
    error); absent -> a typed NULL column.  Source columns outside the
    target are dropped (``on_extra="drop"``), kept after the target
    columns (``"keep"``), or a ``ValueError`` (``"error"``).  Output
    column order is the target's — stable for parquet appends and
    UNION ALL.  Pure projection: no shuffle, no data pass.
    """
    import pyspark.sql.functions as F

    if on_extra not in ("drop", "keep", "error"):
        raise ValueError(f"unknown on_extra {on_extra!r}")
    have = {c: t for c, t in df.dtypes}
    out = []
    for field in target.fields:
        if field.name in have:
            col = F.col(field.name)
            if have[field.name] != field.dataType.simpleString():
                col = (
                    col.cast(field.dataType)
                    if strict_casts
                    else col.try_cast(field.dataType)
                )
            out.append(col.alias(field.name))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    extras = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if extras and on_extra == "error":
        raise ValueError(f"unexpected columns {extras}")
    if extras and on_extra == "keep":
        out += [F.col(c) for c in extras]
    return df.select(*out)
