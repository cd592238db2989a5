"""Watermarked stream-stream inner join: matches across micro-batches via
the join state store must equal the batch join on the same data."""

from __future__ import annotations

import json
import time

from skylogix_real_time_weather_data_pipeline_spark.streaming.pipeline import (
    stream_stream_join,
)

# impressions then clicks; the (u1, imp1) ↔ (u1, 09:10 click) match spans
# micro-batches, (u2) matches in-batch, the 11:00 click is outside the
# 30-minute attribution window, u3's click has no impression
_IMPRESSIONS = [
    {"user": "u1", "imp_ts": "2024-03-01T09:00:00", "ad": "a1"},
    {"user": "u2", "imp_ts": "2024-03-01T09:05:00", "ad": "a2"},
]
_CLICKS_B1 = [
    {"user": "u2", "click_ts": "2024-03-01T09:20:00"},
    {"user": "u3", "click_ts": "2024-03-01T09:21:00"},
]
_CLICKS_B2 = [
    {"user": "u1", "click_ts": "2024-03-01T09:10:00"},
    {"user": "u1", "click_ts": "2024-03-01T11:00:00"},
]

_IMP_SCHEMA = "user string, imp_ts timestamp, ad string"
_CLK_SCHEMA = "user string, click_ts timestamp"


def _write(path, name, rows):
    path.mkdir(exist_ok=True)
    with open(path / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_join_matches_batch_across_micro_batches(spark, tmp_path):
    imp_dir, clk_dir, ckpt = tmp_path / "imp", tmp_path / "clk", tmp_path / "ckpt"
    _write(imp_dir, "b1.json", _IMPRESSIONS)
    _write(clk_dir, "b1.json", _CLICKS_B1)
    time.sleep(1.1)
    _write(clk_dir, "b2.json", _CLICKS_B2)

    imps = (
        spark.readStream.schema(_IMP_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(imp_dir))
    )
    clks = (
        spark.readStream.schema(_CLK_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(clk_dir))
    )
    joined = stream_stream_join(
        imps, clks, key_col="user", left_ts="imp_ts", right_ts="click_ts",
        watermark="1 hour", within="30 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_mem")
        .outputMode("append").option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r.user, r.ad, r.click_ts.isoformat()) for r in spark.table("ssj_mem").collect()
    }

    import datetime as dt

    b_imps = spark.createDataFrame(
        [(d["user"], dt.datetime.fromisoformat(d["imp_ts"]), d["ad"]) for d in _IMPRESSIONS],
        _IMP_SCHEMA,
    )
    b_clks = spark.createDataFrame(
        [(d["user"], dt.datetime.fromisoformat(d["click_ts"])) for d in _CLICKS_B1 + _CLICKS_B2],
        _CLK_SCHEMA,
    )
    batch_rows = {
        (r.user, r.ad, r.click_ts.isoformat())
        for r in stream_stream_join(
            b_imps, b_clks, key_col="user", left_ts="imp_ts", right_ts="click_ts",
            watermark="1 hour", within="30 minutes",
        ).collect()
    }
    assert ("u1", "a1", "2024-03-01T09:10:00") in stream_rows  # cross-batch match
    assert ("u1", "a1", "2024-03-01T11:00:00") not in stream_rows  # window bound
    assert stream_rows == batch_rows


def test_stream_stream_join_rejects_same_ts_name(spark):
    import pytest

    df = spark.createDataFrame([("u", "2024-01-01")], "user string, ts string")
    with pytest.raises(ValueError, match="distinct column names"):
        stream_stream_join(df, df, key_col="user", left_ts="ts", right_ts="ts")


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer rows only materialize once the watermark proves no future
    match can arrive: u4's impression emits with NULL click after later
    batches push the watermark past its match window."""
    imp_dir, clk_dir, ckpt = tmp_path / "imp", tmp_path / "clk", tmp_path / "ckpt"
    _write(imp_dir, "b1.json", [
        {"user": "u1", "imp_ts": "2024-03-01T09:00:00", "ad": "a1"},
        {"user": "u4", "imp_ts": "2024-03-01T09:01:00", "ad": "a4"},  # never clicked
    ])
    _write(clk_dir, "b1.json", [{"user": "u1", "click_ts": "2024-03-01T09:10:00"}])
    time.sleep(1.1)
    # watermark pushers: far-future rows on BOTH sides (global watermark is
    # the min across inputs), split across two files so eviction runs in a
    # batch after the watermark update
    _write(imp_dir, "b2.json", [{"user": "zz", "imp_ts": "2024-03-01T15:00:00", "ad": "zz"}])
    _write(clk_dir, "b2.json", [{"user": "zz", "click_ts": "2024-03-01T15:00:00"}])
    time.sleep(1.1)
    _write(imp_dir, "b3.json", [{"user": "zz", "imp_ts": "2024-03-01T16:00:00", "ad": "zz"}])
    _write(clk_dir, "b3.json", [{"user": "zz", "click_ts": "2024-03-01T16:00:00"}])

    imps = (
        spark.readStream.schema(_IMP_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(imp_dir))
    )
    clks = (
        spark.readStream.schema(_CLK_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(clk_dir))
    )
    joined = stream_stream_join(
        imps, clks, key_col="user", left_ts="imp_ts", right_ts="click_ts",
        watermark="1 hour", within="30 minutes", how="left_outer",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_outer_mem")
        .outputMode("append").option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {(r.user, r.click_ts) for r in spark.table("ssj_outer_mem").collect()}
    assert ("u1", __import__("datetime").datetime(2024, 3, 1, 9, 10)) in rows
    assert ("u4", None) in rows  # unmatched left emitted with NULL right
