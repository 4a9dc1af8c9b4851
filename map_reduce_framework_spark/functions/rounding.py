"""Engine-portable decimal rounding.

``round(x, n)`` is NOT portable across engines on DOUBLE: Spark uses Java
BigDecimal HALF_UP on the exact binary expansion, DuckDB's round can
differ at representation boundaries (observed: 0.49024999999999996 → 4dp
gives 0.4902 in Spark, 0.4903 in DuckDB 1.0).  Since the driver's
correctness gate hash-compares values exactly, every rounded output
column in this engine uses ONE formula on BOTH sides:

    floor(x * 10^n + 0.5) / 10^n

computed in IEEE double in both engines — identical inputs therefore
produce bit-identical outputs.  (Half-way cases round toward +inf for
negative values too; that bias is irrelevant here — what matters is that
both engines agree.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column, n: int) -> Column:
    """Portable round-to-n-decimals (double), Spark side."""
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def rnd_sql(expr: str, n: int) -> str:
    """Portable round-to-n-decimals (double), DuckDB side."""
    scale = 10**n
    return f"(floor(({expr}) * {scale}::DOUBLE + 0.5::DOUBLE) / {scale}::DOUBLE)"
