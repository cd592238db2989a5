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

    ``how`` may be ``inner`` or ``left`` (unmatched points kept with
    NULL-extended interval columns). ``right``/``full`` are rejected:
    intervals are replicated once per overlapped chunk, so a NULL-extension
    per unmatched *copy* would duplicate unmatched interval rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")

    # floor, not truncate-toward-zero: pre-1970 (negative epoch) timestamps
    # must land in the same chunk grid as positive ones
    p_chunk = F.floor(F.col(point_ts).cast("long") / chunk_seconds)
    i_first = F.floor(F.col(start_ts).cast("long") / chunk_seconds)
    # end is exclusive: a zero-length chunk tail isn't registered
    i_last = F.floor((F.col(end_ts).cast("long") - F.lit(1)) / chunk_seconds)

    pts = points.withColumn("_chunk", p_chunk).alias("p")
    ivs = intervals.withColumn(
        "_chunk", F.explode(F.sequence(i_first, F.greatest(i_last, i_first)))
    ).alias("i")

    # bounds are part of the JOIN condition (not a post-filter) so outer
    # joins keep unmatched point rows instead of silently dropping them
    cond: Column = (
        (F.col("p._chunk") == F.col("i._chunk"))
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}"))
        & (F.col(f"p.{point_ts}") < F.col(f"i.{end_ts}"))
    )
    if by:
        cond = cond & (F.col(f"p.{by}") == F.col(f"i.{by}"))

    joined = pts.join(ivs, cond, how)
    out = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}").alias(c) for c in intervals.columns if c != by
    ]
    return joined.select(*out)
