"""As-of join — the time-series operator Spark lacks natively
(SURVEY §7.3 'custom operators': composition of existing DataFrame ops).

For each left row, attach the most recent right row with the same key and
``right.ts <= left.ts``. Implemented with the union + window trick:

  1. tag both sides and union them on (key, ts) — ONE dataset, no join;
  2. per key ordered by (ts, side-tag), ``last(right_row_struct,
     ignoreNulls)`` over rows-unbounded-preceding carries the latest right
     ROW forward — the whole row as one struct, so a matched right row
     whose value columns are legitimately NULL is still the row carried
     (per-column last(ignorenulls) would skip it and resurrect older
     values, diverging from as-of semantics);
  3. keep only left rows and unpack the struct.

Cost: a single shuffle+sort on the key — the same price as one sort-merge
join, but with no equality-join explosion and no range-condition
re-scan. This is the standard scale-out formulation (backward as-of).
Skewed keys can be salted upstream if one key dominates (operators/joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest ``right`` row per ``by`` key with
    ``right[on] <= left[on]``, appended to each ``left`` row.

    value_cols: right columns to carry (default: all non-key, non-ts).
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in {on, *by}]
    )

    from pyspark.sql.types import StructField, StructType

    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    lt = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(r_struct_type)
    )
    rt = right.select(
        *by, on, F.struct(*[F.col(c) for c in value_cols]).alias("_r")
    ).withColumn("_side", F.lit(0))
    left_extra = [c for c in left.columns if c not in {on, *by}]
    for c in left_extra:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = [*by, on, *left_extra, "_r", "_side"]
    unioned = lt.select(cols).unionByName(rt.select(cols))

    # right rows (side 0) sort before left rows at the same timestamp, so a
    # right row AT left.ts is visible to it (<=, not <)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *by,
        on,
        *left_extra,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r_carried"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *by,
        on,
        *left_extra,
        *[F.col("_r_carried").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
