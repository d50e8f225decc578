"""Cross-engine-deterministic numeric helpers.

Two traps this module exists to avoid:

1. Bare decimal literals ("0.75") parse as DECIMAL in both Spark SQL
   and DuckDB with *different* precision/scale division rules — every
   float constant must be written ``CAST(… AS DOUBLE)``.
2. ``round(x, n)`` differs across engines (Spark BigDecimal HALF_UP vs
   DuckDB nearbyint HALF_EVEN) — rounding for oracle-compared outputs
   uses the shared formula ``floor(x * 1e{n} + 0.5) / 1e{n}``, which is
   pure IEEE arithmetic and therefore bit-identical given identical
   input bits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dlit(x: float) -> str:
    """A SQL double literal that parses as DOUBLE in Spark and DuckDB."""
    return f"CAST({float(x)!r} AS DOUBLE)"


def round_sql(expr: str, nd: int = 6) -> str:
    """Half-up decimal rounding as plain IEEE ops; same string works in
    Spark ``F.expr`` and DuckDB."""
    scale = f"CAST(1e{nd} AS DOUBLE)"
    return f"(floor(({expr}) * {scale} + CAST(0.5 AS DOUBLE)) / {scale})"


def round_col(col: Column, nd: int = 6) -> Column:
    scale = float(10**nd)
    return F.floor(col * scale + F.lit(0.5)) / scale
