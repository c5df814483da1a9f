"""Deterministic numeric aggregation helpers.

Problem: ``SUM(double)`` is order-dependent in its low bits, and Spark's
partial/final aggregation order differs run-to-run and engine-to-engine,
so a raw double sum can never hash-match a DuckDB oracle bitwise.

Pattern: cast the (double) expression to a fixed-scale decimal *before*
aggregating. Decimal addition is exact and associative, so the sum is
identical regardless of partial-aggregation order or engine; a final
``round(…, k)::double`` yields a bitwise-stable double on both sides.

Why the double→decimal cast itself is safe: decimal midpoints at scale
``s > 0`` (…5×10⁻ˢ⁻¹) have no finite binary representation, so a double
is never exactly on a rounding boundary — HALF_UP (Spark) and DuckDB's
rounding agree on every representable input.

This costs decimal (non-codegen-friendly) arithmetic in the aggregate.
At the 100 TB design point you would keep raw-double sums for speed and
tolerate last-bit drift; the decimal path exists for oracle-grade
reproducibility and is still map-side-combinable (partial sums are
decimals), so the shuffle volume is identical.

The SQL mirror for ``dsum(c, alias, 2)`` is::

    CAST(ROUND(SUM(CAST(c AS DECIMAL(18, 8))), 2) AS DOUBLE) AS alias
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# precision 18 keeps the per-value decimal long-backed (measurably
# faster than decimal(28,8)); SUM's accumulator gets +10 digits of
# headroom (decimal(28,8) ≈ 10^20) — ample past 10^13 rows of 10^5-
# magnitude values. Scale stays 8: rounding the sum to 2 decimals can
# only tie on an exact ...500000 tail (p ≈ 1e-6 per aggregate); scale 4
# made that p ≈ 1e-4 and was observed to diverge from DuckDB's tie rule.
ACC = "decimal(18,8)"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent sum of a double expression; see module docstring."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(ACC)), scale).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, rounded.

    SQL mirror: ``CAST(ROUND(SUM(CAST(c AS DECIMAL(18,8))) / COUNT(c), s)
    AS DOUBLE)`` — division done in double space on both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    mean = F.sum(c.cast(ACC)).cast("double") / F.count(c)
    return F.round(mean, scale).cast("double").alias(alias)
