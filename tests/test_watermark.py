"""Watermark semantics (SURVEY §2.9 'late data'): in append mode with a
checkpointed watermark, an event arriving later than the watermark allows
is dropped — its already-finalized window is NOT re-emitted or recounted.

This is the one place streaming semantics deliberately differ from the
reference (which re-reads all history each run and never drops; parity mode
remains availableNow over the full directory — SURVEY §7.4.5)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F


def _write_events(path, rows):
    path.mkdir(exist_ok=True)
    import uuid

    fn = path / f"batch_{uuid.uuid4().hex[:8]}.json"
    with open(fn, "w") as f:
        for city, ts in rows:
            f.write(json.dumps({"city": city, "ts": ts}) + "\n")


def _run_windowed(spark, src_dir, out, ckpt):
    stream = spark.readStream.schema("city string, ts timestamp").json(str(src_dir))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "city")
        .count()
        .select(F.col("w.start").alias("ws"), "city", "count")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    # run 1: one event per hour 01:00..10:00 → watermark ends at 09:00,
    # windows [01:00..09:00) finalized and appended
    _write_events(src, [("A", f"2024-01-01 {h:02d}:00:00") for h in range(1, 11)])
    _run_windowed(spark, src, out, ckpt)

    # run 2: a late event inside the long-finalized [03:00,04:00) window,
    # plus an on-time event at 12:00 that advances the watermark
    _write_events(src, [("A", "2024-01-01 03:30:00"), ("A", "2024-01-01 12:00:00")])
    _run_windowed(spark, src, out, ckpt)

    result = {
        (str(r.ws), r.city): r["count"]
        for r in spark.read.parquet(str(out)).collect()
    }
    # the late 03:30 event did NOT re-open or recount its window
    assert result[("2024-01-01 03:00:00", "A")] == 1
    # duplicates would show as a second row for the same window: assert none
    rows = spark.read.parquet(str(out)).groupBy("ws", "city").count()
    assert rows.filter(F.col("count") > 1).count() == 0
    # on-time windows kept flowing ([09:00,10:00) and [10:00,11:00) emitted in run 2)
    assert ("2024-01-01 10:00:00", "A") in result


def test_late_event_kept_in_availablenow_parity_mode(spark, tmp_path):
    """SURVEY §7.4.5 parity delta, pinned from both sides (r3 VERDICT item
    6): the SAME late event that watermarked append mode drops IS counted
    by the reference-parity path, which (like the reference's re-read-all-
    history runs) recomputes over the full directory with no watermark."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    _write_events(src, [("A", f"2024-01-01 {h:02d}:00:00") for h in range(1, 11)])
    _run_windowed(spark, src, out, ckpt)
    _write_events(src, [("A", "2024-01-01 03:30:00"), ("A", "2024-01-01 12:00:00")])
    _run_windowed(spark, src, out, ckpt)

    # watermarked append mode: the finalized [03:00,04:00) window stayed at 1
    appended = {
        (str(r.ws), r.city): r["count"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert appended[("2024-01-01 03:00:00", "A")] == 1

    # parity mode: full-directory recompute (batch plan, no watermark) —
    # the late 03:30 event lands in its window
    batch = spark.read.schema("city string, ts timestamp").json(str(src))
    parity = {
        (str(r.ws), r.city): r["count"]
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "city")
            .count()
            .select(F.col("w.start").alias("ws"), "city", "count")
            .collect()
        )
    }
    assert parity[("2024-01-01 03:00:00", "A")] == 2
    # and every on-time window agrees between the two modes
    for key, n in appended.items():
        if key != ("2024-01-01 03:00:00", "A"):
            assert parity.get(key) == n, key
