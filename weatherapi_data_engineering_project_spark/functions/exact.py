"""Exact-arithmetic aggregation helpers.

Floating-point SUM is order-dependent; a distributed Spark aggregation
and a single-threaded oracle (or a 1000-executor rerun of the same
query) will legitimately disagree in the last bits. The engine's
policy for money-like measures is therefore: *aggregate in decimal,
surface as double*. Decimal addition is exact and associative, so the
result is identical under any partitioning / shuffle order / AQE
re-plan — which is also what makes results reproducible at 100 TB.

Cast-to-decimal of a double rounds the double's exact binary value to
the target scale; since decimal midpoints (e.g. x.5e-4) are never
exactly representable in binary, HALF_UP (Spark) and round-to-nearest
(DuckDB/C) agree on every input, making the oracle comparison exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-insensitive SUM of a double measure, returned as double.

    SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-insensitive AVG: exact decimal sum divided by count, as double.

    SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)
