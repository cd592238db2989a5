"""Range (interval) join — point-in-interval matching at scale.

Naive formulations (cross join + filter, or equi-join on key with an
inequality residual) degenerate when intervals are long-lived or keys are
few: every probe row meets every interval. The scale formulation here is
**chunked**: time is cut into fixed-width chunks; an interval registers in
every chunk it overlaps, a point registers in exactly one, and the join is
a pure equi-join on (key, chunk) with the precise bounds check as a cheap
residual filter. Cost tracks true overlap density, and the chunk key keeps
the shuffle uniform.

Chunk width trades replication (long intervals × narrow chunks = more
copies) against bucket selectivity; pick ~the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: str | None = None,
    chunk_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with
    ``start <= point < end`` (and equal ``by`` key if given).

    All three ts columns must be TimestampType. Output = point columns +
    interval columns (names must not collide apart from ``by``).
    """
    p_chunk = (F.col(point_ts).cast("long") / chunk_seconds).cast("long")
    i_first = (F.col(start_ts).cast("long") / chunk_seconds).cast("long")
    # end is exclusive: a zero-length chunk tail isn't registered
    i_last = ((F.col(end_ts).cast("long") - F.lit(1)) / chunk_seconds).cast("long")

    pts = points.withColumn("_chunk", p_chunk)
    ivs = intervals.withColumn(
        "_chunk", F.explode(F.sequence(i_first, F.greatest(i_last, i_first)))
    )

    keys = ["_chunk"] + ([by] if by else [])
    joined = pts.join(ivs, on=keys, how=how)
    residual: Column = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    return joined.filter(residual).drop("_chunk")
