"""Cross-engine-exact floating aggregates.

Double-precision SUM/AVG are order-dependent: Spark sums partial
aggregates in shuffle arrival order, DuckDB in its own order, so the
same data can hash-differently in the last ulp. For oracle-checked
queries every floating aggregate goes through an exact decimal
intermediate: per-row cast double->decimal (deterministic: doubles
never sit exactly on a decimal rounding boundary, so both engines round
identically), exact decimal addition (order-independent), then one
cast back to double. The oracle SQL mirrors the same shape:

    CAST(SUM(CAST(x AS DECIMAL(28, s)) ) AS DOUBLE)

Cost note (100 TB): decimal sums are a few times slower than double
sums but still whole-stage-codegen'd JVM work; use them for
correctness-gated outputs and plain double sums where last-ulp
reproducibility doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf0.1 sums of prices (~1e11) with headroom at 1e9 rows.
_PRECISION = 28


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM(double) via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PRECISION},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({_PRECISION},{scale})")).cast("double")
        / F.count(c)
    )


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle-side twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle-side twin of davg()."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
