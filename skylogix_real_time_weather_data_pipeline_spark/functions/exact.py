"""Order-independent (bit-stable) numeric aggregates.

``ROUND(SUM(double), k)`` is a hash-compare hazard: IEEE-754 addition is
not associative, Spark's partial-aggregation fold order varies run to run
with partitioning and thread scheduling, and DuckDB folds in yet another
order — so an aggregate whose exact value sits within the float-fold
wobble of a rounding boundary (half-cent for money, 5e-7 for 6-dp means)
flips its last rounded digit nondeterministically. Two such flips were
observed locally this round (``weather_temperature_trends``,
``rel_product_profit``) and the per-cell probability scales with both the
magnitude of the sum and the number of output cells.

The fix is the one TPC-H itself mandates: aggregate money (and any value
feeding a rounded output) as DECIMAL, which is exact and therefore
order-independent. Per-row *scalar* double arithmetic is bit-identical
across engines (same expression tree, same IEEE semantics); only the
variable-order FOLD is hazardous. So: compute the per-row value in double,
cast once to a decimal wide enough to preserve it past the output rounding
digit, sum exactly, cast back.

Every helper here has an SQL twin (``sql_*``) for the DuckDB oracles —
both sides must fold in decimal or the engines diverge again. The cast
itself is deterministic and engine-agreeing: a double exactly on a decimal
half-ulp tie is (measure-zero, and for .5-at-scale-2 impossible since
binary fractions can't end in decimal ...5) not a practical concern, and
both engines round casts half-away-from-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale for computed expressions: 10 fractional digits keeps ~8 guard
#: digits past the 2-dp money rounding, and DECIMAL(24,10) leaves 14
#: integral digits — 1e14, comfortably above any 100 TB-scale money sum.
_XDEC = "decimal(24,10)"
#: scale for raw 2-dp money columns (prices, balances): the cast to cents
#: is exact on the stored values, and 16 integral digits of headroom.
_MDEC = "decimal(18,2)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str) -> Column:
    """Exact sum of a raw 2-decimal money column (order-independent)."""
    return F.sum(_col(c).cast(_MDEC)).cast("double")


def dsumx(c: Column | str) -> Column:
    """Exact sum of a computed double expression (order-independent).

    The per-row double is cast to DECIMAL(24,10) — identical in Spark and
    DuckDB because the input doubles are bit-identical — then summed
    exactly.
    """
    return F.sum(_col(c).cast(_XDEC)).cast("double")


def dmean(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count.

    Identical null semantics to AVG (sum skips nulls, count counts
    non-nulls; all-null group → NULL).
    """
    c = _col(c)
    return F.sum(c.cast(_XDEC)).cast("double") / F.count(c)


# --- DuckDB oracle twins --------------------------------------------------

def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_dsumx(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(24,10))) AS DOUBLE)"


def sql_dmean(expr: str) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(24,10))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )
