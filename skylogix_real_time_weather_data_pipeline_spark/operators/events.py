"""Event-stream analytics: ordered funnels and retention cohorts.

Classic product-analytics operators over an (user, ts, event_type) event
log — the batch forms; both are incrementalizable (the funnel's per-stage
min-timestamps and the cohort's first-seen table are monotone aggregates).

Scale shape: everything is keyed by user_id, so each stage is one shuffle
on a high-cardinality skew-free key; per-stage frames carry only
(user_id, timestamp) — the event payload never crosses an exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(df: DataFrame, steps: Sequence[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel user counts: a user reaches step k iff an event of
    type ``steps[k]`` occurs STRICTLY AFTER their step-(k-1) arrival time.

    Each stage is min(ts) per user over the type-filtered log joined to the
    survivors of the previous stage — k stages = k user-keyed shuffles over
    (user_id, ts) pairs only. Returns one row per stage:
    (stage, n_users, pct_of_top), stages labeled '1_<type>', '2_<type>', …
    so they sort in funnel order.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    prev: DataFrame | None = None
    stage_counts = []
    for i, step in enumerate(steps):
        cur = df.filter(F.col(type_col) == step).select(user_col, ts_col)
        if prev is not None:
            cur = cur.join(prev, user_col).filter(F.col(ts_col) > F.col("_t_prev"))
        cur = cur.groupBy(user_col).agg(F.min(ts_col).alias("_t_prev"))
        stage_counts.append(
            cur.agg(
                F.lit(f"{i + 1}_{step}").alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = cur
    out = stage_counts[0]
    for s in stage_counts[1:]:
        out = out.unionByName(s)
    top = stage_counts[0].select(F.col("n_users").alias("_n_top"))
    return out.crossJoin(F.broadcast(top)).select(
        "stage",
        "n_users",
        F.round(F.col("n_users") / F.col("_n_top"), 6).alias("pct_of_top"),
    )


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen week
    (cohort), counted in each later week they were active.

    Two user-keyed aggregations (first-seen, distinct active weeks) and one
    join on user_id; only (user_id, week) pairs shuffle. Returns
    (cohort_week, week_offset, n_active, cohort_size, retention).
    """
    wk = df.select(user_col, F.date_trunc("week", ts_col).alias("wk"))
    first = wk.groupBy(user_col).agg(F.min("wk").alias("cohort_week"))
    active = wk.distinct()
    ret = (
        active.join(first, user_col)
        .groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.countDistinct(user_col).alias("cohort_size")
    )
    return ret.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )
