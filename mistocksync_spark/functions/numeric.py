"""Order-independent, cross-engine-deterministic numeric aggregates.

Two divergence classes hide in ``round(SUM(double))`` / ``round(AVG(double))``:

1. **Partition-order dependence** — parallel double summation accumulates
   in engine- and partition-order-specific order, so the rounded result
   flips on half-cases between machines (the CORRECTNESS_r05
   ``lineitem_profile`` / ``events_winsorized`` hash-FAIL class, and the
   gapfill family before commit d8766cb).
2. **Cross-engine cast/round divergence on full-precision doubles** —
   Spark rounds/casts a double via its SHORTEST decimal repr
   (``BigDecimal.valueOf(Double.toString(d))``), DuckDB via the EXACT
   binary value.  For raw low-precision columns (the 2-dp feeds) both
   agree, but a DERIVED double (a product, quotient, or abs-difference)
   can land with its repr on the other side of a half-case: one
   ``events_forecast_backtest`` sMAPE term quantized one micro-unit apart
   between engines under the DECIMAL(18,6)-cast pattern.

The fix here closes both: quantize each value to integer micro-units with
``floor(x * 1e6 + 0.5)`` — pure IEEE-754 multiply/add/floor that every
engine computes bit-identically on the identical double — then accumulate
the integers exactly (associative, order-independent), and finalize with
more pure IEEE double ops.  No decimal cast, no double round() anywhere.

Scale: per-row micros fit easily (|x| < 9e9); the Spark-side sum
accumulates in DECIMAL(38,0) and DuckDB's in HUGEINT, so group totals
never overflow even at 100 TB.  The final cast-to-double of the exact
integer total is correctly-rounded nearest in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MICROS = 1_000_000.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _u(col: Column | str) -> Column:
    """Per-row micro-unit quantization (6 dp, half-up), IEEE-deterministic
    for ANY double: floor(x * 1e6 + 0.5) as an overflow-proof decimal."""
    return F.floor(_c(col) * F.lit(_MICROS) + F.lit(0.5)).cast("decimal(38,0)")


def dec_sum(col: Column | str, nd: int) -> Column:
    """Order-independent ``round(SUM(col), nd)`` over doubles: exact
    integer micro-unit accumulation, then half-up rounding at ``nd`` dp
    done with deterministic double arithmetic."""
    scale = float(10 ** (6 - nd))
    s = F.sum(_u(col)).cast("double")
    return F.floor(s / F.lit(scale) + F.lit(0.5)) / F.lit(float(10**nd))


def dec_avg(col: Column | str) -> Column:
    """Order-independent ``AVG(col)`` over doubles: exact micro-unit sum,
    unrounded bit-identical double quotient (nulls excluded from both sum
    and count, matching AVG semantics)."""
    c = _c(col)
    return F.sum(_u(c)).cast("double") / F.lit(_MICROS) / F.count(c)


def _sql_u(expr: str) -> str:
    return f"CAST(floor(({expr}) * 1000000 + 0.5) AS HUGEINT)"


def sql_dec_sum(expr: str, nd: int) -> str:
    """DuckDB twin of :func:`dec_sum` for oracle SQL strings — the same
    IEEE op sequence, so results are bit-identical by construction."""
    scale = float(10 ** (6 - nd))
    return (
        f"floor(CAST(SUM({_sql_u(expr)}) AS DOUBLE) / {scale!r} + 0.5)"
        f" / {float(10 ** nd)!r}"
    )


def sql_dec_avg(expr: str) -> str:
    """DuckDB twin of :func:`dec_avg` for oracle SQL strings."""
    return (
        f"CAST(SUM({_sql_u(expr)}) AS DOUBLE) / 1000000.0 / COUNT({expr})"
    )
