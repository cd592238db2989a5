"""load_table physical-encoding normalization (sources/batch.py).

Pins the r3 ADVICE item: the NTZ→instant conversion must be
zone-INDEPENDENT — a caller that flips spark.sql.session.timeZone between
building the DataFrame and running the action must still get UTC-interpreted
instants (the lazy plain cast would re-resolve against the new zone).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from skylogix_real_time_weather_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def ntz_events_dir(spark):
    """A tiny events table whose ts is TIMESTAMP_NTZ on disk."""
    d = tempfile.mkdtemp(prefix="ntz_events_")
    spark.sql(
        """
        SELECT 1 AS event_id, 7 AS user_id,
               TIMESTAMP_NTZ '2024-06-01 12:00:00.123456' AS ts,
               'click' AS event_type, 1.5 AS value, '{}' AS props
        """
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_ntz_instants_survive_session_zone_flip(spark, ntz_events_dir):
    from pyspark.sql import functions as F

    df = load_table(spark, ntz_events_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    expect = 1_717_243_200_123_456  # 2024-06-01T12:00:00.123456 UTC
    micros = df.select(F.unix_micros("ts")).first()[0]
    assert micros == expect
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        # the hostile sequence from ADVICE: zone reset AFTER plan building
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        micros_flipped = df.select(F.unix_micros("ts")).first()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert micros_flipped == expect


def test_real_events_load_matches_duckdb_epoch(spark):
    """Whatever the on-disk encoding, load_table's ts must agree with
    DuckDB's reading of the same file (µs truncation semantics)."""
    import duckdb

    from pyspark.sql import functions as F

    df = load_table(spark, SF_DIR, "events")
    got = df.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    want = duckdb.sql(
        f"SELECT min(epoch_us(ts)), max(epoch_us(ts)) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()
    assert (got["lo"], got["hi"]) == want
