"""Funnel ordering and retention-cohort semantics (operators/events.py)."""

from __future__ import annotations

import datetime as dt

from skylogix_real_time_weather_data_pipeline_spark.operators.events import funnel, retention_cohorts


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, _ts(1, 1), "view"), (1, _ts(1, 2), "click"), (1, _ts(1, 3), "purchase"),
        # user 2: click BEFORE first view — stage 2 not reached
        (2, _ts(2, 1), "click"), (2, _ts(2, 2), "view"),
        # user 3: view then purchase but no click — stage 3 not reached
        (3, _ts(3, 1), "view"), (3, _ts(3, 2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out["1_view"].n_users == 3
    assert out["2_click"].n_users == 1
    assert out["3_purchase"].n_users == 1
    assert abs(out["3_purchase"].pct_of_top - 1 / 3) < 1e-6


def test_funnel_simultaneous_event_not_counted(spark):
    # strict '>' comparison: a click at the exact view timestamp is ambiguous
    # and excluded
    rows = [(1, _ts(1, 1), "view"), (1, _ts(1, 1), "click")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage: r.n_users for r in funnel(df, ["view", "click"]).collect()}
    assert out == {"1_view": 1, "2_click": 0}


def test_top_transitions_counts_and_shares(spark):
    rows = [
        # user 1: view -> click -> view   (transitions: view->click, click->view)
        (1, 1, _ts(1, 1), "view"), (2, 1, _ts(1, 2), "click"), (3, 1, _ts(1, 3), "view"),
        # user 2: view -> view            (transition: view->view)
        (4, 2, _ts(2, 1), "view"), (5, 2, _ts(2, 2), "view"),
        # user 3: single event — contributes no transition
        (6, 3, _ts(3, 1), "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    from skylogix_real_time_weather_data_pipeline_spark.operators.events import top_transitions

    out = {(r.prev_type, r.event_type): r for r in top_transitions(df).collect()}
    assert out[("view", "click")].n == 1
    assert out[("view", "view")].n == 1
    assert out[("click", "view")].n == 1
    assert len(out) == 3
    # shares: 'view' as prev has 2 outgoing transitions, each 0.5
    assert abs(out[("view", "click")].share_of_prev - 0.5) < 1e-9
    assert abs(out[("click", "view")].share_of_prev - 1.0) < 1e-9


def test_top_transitions_ties_broken_by_event_id(spark):
    # two events at the same timestamp: event_id orders them deterministically
    rows = [(10, 1, _ts(1, 1), "a"), (11, 1, _ts(1, 1), "b")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    from skylogix_real_time_weather_data_pipeline_spark.operators.events import top_transitions

    out = [(r.prev_type, r.event_type) for r in top_transitions(df).collect()]
    assert out == [("a", "b")]


def test_retention_cohorts_triangle(spark):
    rows = [
        # user 1: first seen week of Jan 1 (Monday), active weeks 0 and 2
        (1, _ts(2)), (1, _ts(16)),
        # user 2: same cohort, only week 0
        (2, _ts(3)),
        # user 3: cohort week of Jan 8, active weeks 0 and 1
        (3, _ts(9)), (3, _ts(17)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_week.day, r.week_offset): r for r in retention_cohorts(df).collect()}
    assert out[(1, 0)].n_active == 2 and out[(1, 0)].cohort_size == 2
    assert out[(1, 2)].n_active == 1
    assert abs(out[(1, 2)].retention - 0.5) < 1e-6
    assert out[(8, 1)].n_active == 1 and out[(8, 1)].cohort_size == 1
    assert (1, 1) not in out  # nobody from cohort 1 active in week 1


def test_ab_test_closed_form(spark):
    """Hand-built arms: A = 3/10 conversions, B = 1/10 — z matches the
    textbook pooled two-proportion formula."""
    import math

    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.operators.events import ab_test

    rows = [("A", i < 3) for i in range(10)] + [("B", i < 1) for i in range(10)]
    df = spark.createDataFrame(rows, "arm string, conv boolean")
    out = ab_test(df, variant_col=F.col("arm"), converted=F.col("conv")).collect()[0]
    assert (out.n_a, out.conv_a, out.n_b, out.conv_b) == (10, 3, 10, 1)
    p, se = 4 / 20, math.sqrt((4 / 20) * (16 / 20) * (1 / 10 + 1 / 10))
    z = (0.3 - 0.1) / se
    assert abs(out.z_score - round(z, 6)) < 1e-9
    assert not out.significant  # |z| ≈ 1.118 < 1.96
