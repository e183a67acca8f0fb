"""Cross-engine determinism helpers.

The driver hash-compares Spark results against DuckDB. Floating-point sums
are order-dependent, and the two engines round double→decimal differently
(Spark via shortest-repr BigDecimal, DuckDB via exact binary), so every
aggregated money/measure column goes through the *integer-units* path:

    round(x * 10^s) → BIGINT   (exact, order-independent sum)
    sum(units) / 10^s → DOUBLE (single deterministic division)

Both engines then compute bit-identical doubles. Transcendental results
(log, sqrt, corr) are rounded to 6dp — ulp-level engine differences are
~1e-15, far below the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def units(col: Column | str, scale: int = 2) -> Column:
    """Double → exact integer units at 10^-scale resolution."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale)).cast("long")


def money_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent exact sum of a money/measure double column."""
    return F.round(F.sum(units(col, scale)) / (10**scale), scale).alias(alias)


def money_avg(col: Column | str, alias: str, scale: int = 2, round_to: int = 6) -> Column:
    return F.round(
        F.sum(units(col, scale)) / (10**scale) / F.count(F.lit(1)), round_to
    ).alias(alias)


def sql_units(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(({expr}) * {10**scale}, 0) AS BIGINT)"


def sql_money_sum(expr: str, alias: str, scale: int = 2) -> str:
    return f"ROUND(SUM({sql_units(expr, scale)}) / {float(10**scale)}, {scale}) AS {alias}"


def sql_money_avg(expr: str, alias: str, scale: int = 2, round_to: int = 6) -> str:
    return (
        f"ROUND(SUM({sql_units(expr, scale)}) / {float(10**scale)} / COUNT(*), "
        f"{round_to}) AS {alias}"
    )
