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

    Single-pass plan: ONE scan and ONE user-keyed shuffle gather each
    user's per-step timestamp arrays (collect_list under the groupBy —
    map-side combined); the stage-arrival recurrence
    ``t_k = min{ts ∈ step_k | ts > t_{k-1}}`` then folds over the arrays
    as row-local higher-order expressions, and the stage counts reduce to
    one count(t_k) row. The k-way self-join formulation costs k scans +
    2k shuffles for the same answer. State per user is its own event
    timestamps for the funnel's types only — bounded for human-scale
    activity; pre-cap with a per-user limit upstream if bot users are a
    concern. Returns (stage, n_users, pct_of_top), stages labeled
    '1_<type>', '2_<type>', … so they sort in funnel order.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    per_user = df.groupBy(user_col).agg(
        *[
            F.array_sort(
                F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
            ).alias(f"_ts_{i}")
            for i, s in enumerate(steps)
        ]
    )
    stage_times = [F.element_at(F.col("_ts_0"), 1)]
    for i in range(1, len(steps)):
        prev = stage_times[-1]
        stage_times.append(
            F.array_min(F.filter(F.col(f"_ts_{i}"), lambda t: t > prev))
        )
    counts = per_user.agg(
        *[F.count(t).alias(f"_c{i}") for i, t in enumerate(stage_times)]
    )
    stage_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f"{i + 1}_{s}").alias("stage"),
                    F.col(f"_c{i}").alias("n_users"),
                )
                for i, s in enumerate(steps)
            ]
        )
    )
    return counts.select(stage_rows.alias("s"), F.col("_c0").alias("_n_top")).select(
        "s.stage",
        "s.n_users",
        F.round(F.col("s.n_users") / F.col("_n_top"), 6).alias("pct_of_top"),
    )


def top_transitions(df: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", type_col: str = "event_type",
                    id_col: str = "event_id") -> DataFrame:
    """First-order transition matrix of the event log: counts of
    (prev_type → type) steps within each user's timeline, with the
    per-prev-type share — the Markov-chain view behind next-action models
    and anomalous-flow detection.

    One user-keyed window pass (ordered by ts with the event id as a
    deterministic tiebreak) produces the lag pairs; the count is a
    map-side-combinable agg over ≤ |types|² groups, and the share reuses
    that tiny aggregate through a window sum — no second scan. Each user's
    first event has no predecessor and is excluded (a synthetic '<start>'
    state would double-count sessions at scale)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = df.select(
        user_col, F.lag(type_col).over(w).alias("prev_type"), F.col(type_col)
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", type_col).agg(F.count(F.lit(1)).alias("n"))
    w_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        type_col,
        "n",
        F.round(F.col("n") / F.sum("n").over(w_prev), 6).alias("share_of_prev"),
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


def ab_test(df: DataFrame, variant_col: Column, converted: Column,
            z_threshold: float = 1.96) -> DataFrame:
    """Two-proportion z-test between two experiment arms — the A/B
    readout every event pipeline ends with. ``variant_col`` must take the
    values 'A'/'B'; ``converted`` is a boolean per event.

    One scan, one tiny agg: per-arm (n, conversions) via conditional
    counts, then the pooled z statistic
    z = (p_A − p_B) / sqrt(p(1−p)(1/n_A + 1/n_B)) computed on the
    aggregated scalars only. All inputs to the float expression are exact
    integers, so both engines evaluate the identical IEEE expression; the
    significance flag compares the unrounded double to the threshold.
    Returns one row: (n_a, conv_a, rate_a, n_b, conv_b, rate_b, z_score,
    significant).
    """
    agg = df.agg(
        F.sum(F.when(variant_col == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(variant_col == "A", converted.cast("int")).otherwise(0)).cast("long").alias("conv_a"),
        F.sum(F.when(variant_col == "B", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(variant_col == "B", converted.cast("int")).otherwise(0)).cast("long").alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    z = (p_a - p_b) / se
    return agg.select(
        "n_a",
        "conv_a",
        F.round(p_a, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > z_threshold).alias("significant"),
    )
