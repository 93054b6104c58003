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
