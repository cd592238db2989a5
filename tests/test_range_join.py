"""Chunked range-join semantics: inner match, left-outer NULL extension,
negative-epoch (pre-1970) chunk alignment, and rejection of right/full."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from skylogix_real_time_weather_data_pipeline_spark.operators.range_join import range_join

UTC = dt.timezone.utc


def _ts(y, m, d, h=0):
    return dt.datetime(y, m, d, h, tzinfo=UTC)


def _frames(spark):
    pts = spark.createDataFrame(
        [
            (1, _ts(2024, 1, 1, 5), "in-window"),
            (2, _ts(2024, 1, 2, 23), "no-window"),
        ],
        "pid long, ts timestamp, tag string",
    ).select("pid", F.to_timestamp("ts").alias("ts"), "tag")
    ivs = spark.createDataFrame(
        [(_ts(2024, 1, 1, 0), _ts(2024, 1, 1, 12), "w1")],
        "w_start timestamp, w_end timestamp, wname string",
    )
    return pts, ivs


def test_range_join_inner(spark):
    pts, ivs = _frames(spark)
    out = range_join(pts, ivs, "ts", "w_start", "w_end", chunk_seconds=3600).collect()
    assert [(r.pid, r.wname) for r in out] == [(1, "w1")]


def test_range_join_left_outer_keeps_unmatched_points(spark):
    pts, ivs = _frames(spark)
    out = range_join(pts, ivs, "ts", "w_start", "w_end", chunk_seconds=3600, how="left")
    got = {r.pid: r.wname for r in out.collect()}
    assert got == {1: "w1", 2: None}
    assert out.count() == 2


def test_range_join_rejects_right_outer(spark):
    pts, ivs = _frames(spark)
    with pytest.raises(ValueError, match="inner.*left"):
        range_join(pts, ivs, "ts", "w_start", "w_end", how="right")


def test_range_join_pre_epoch_chunks_floor_not_truncate(spark):
    """Negative epoch seconds: truncate-toward-zero would put a point and
    its enclosing interval in different chunks near t=0; floor must not."""
    pts = spark.createDataFrame(
        [(1, _ts(1969, 12, 31, 23))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(_ts(1969, 12, 31, 22), _ts(1970, 1, 1, 2), "w0")],
        "w_start timestamp, w_end timestamp, wname string",
    )
    out = range_join(pts, ivs, "ts", "w_start", "w_end", chunk_seconds=3600).collect()
    assert [(r.pid, r.wname) for r in out] == [(1, "w0")]
