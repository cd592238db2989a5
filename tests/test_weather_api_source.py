"""Spark 4 Python DataSource for the weather API (sources/weather_api.py):
batch read enriches per reference extract semantics; the stream reader's
per-city offsets deliver exactly-once incremental micro-batches."""

from __future__ import annotations

import json

import pytest

from skylogix_real_time_weather_data_pipeline_spark.sources.weather_api import (
    WeatherApiDataSource,
)

NOW = "2024-06-01T12:00:00"


def _write_fixture(d, city, country, payloads):
    with open(d / f"{city}_{country}.json", "w") as f:
        json.dump(payloads, f)


@pytest.fixture()
def fixture_dir(tmp_path):
    d = tmp_path / "api"
    d.mkdir()
    _write_fixture(d, "London", "GB", [{"main": {"temp": 11.5}}, {"main": {"temp": 12.0}}])
    _write_fixture(d, "Tokyo", "JP", [{"main": {"temp": 21.0}}])
    return d


def _register(spark):
    # re-registering the same name is fine; keeps tests order-independent
    spark.dataSource.register(WeatherApiDataSource)


def test_batch_read_partitions_per_city_and_enriches(spark, fixture_dir):
    _register(spark)
    df = (
        spark.read.format("weather_api")
        .option("fixture_dir", str(fixture_dir))
        .option("fixed_now", NOW)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 3
    by_city = {}
    for r in rows:
        by_city.setdefault(r.city_name, []).append(r)
    assert set(by_city) == {"London", "Tokyo"}
    assert by_city["London"][0].country_code == "GB"
    assert all(r.extraction_timestamp == NOW for r in rows)
    # payload round-trips as JSON for downstream from_json/VARIANT parsing
    assert json.loads(by_city["Tokyo"][0].payload) == {"main": {"temp": 21.0}}
    # one input partition per city → executor-parallel ingest
    assert df.rdd.getNumPartitions() == 2


def test_stream_reads_only_new_payloads_per_microbatch(spark, fixture_dir, tmp_path):
    """Real micro-batch planning (Python stream sources don't support
    AvailableNow): run → stop → append payloads → restart from the same
    checkpoint → only the delta arrives."""
    import time

    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def _read_out():
        try:
            return spark.read.schema(
                "city_name string, country_code string, "
                "extraction_timestamp string, payload string"
            ).parquet(out).collect()
        except Exception:
            return []

    def run_until(n_rows):
        q = (
            spark.readStream.format("weather_api")
            .option("fixture_dir", str(fixture_dir))
            .option("fixed_now", NOW)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if len(_read_out()) >= n_rows:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        return _read_out()

    first = run_until(3)
    assert len(first) == 3

    # append one payload to London, add a brand-new city file
    _write_fixture(
        fixture_dir, "London", "GB",
        [{"main": {"temp": 11.5}}, {"main": {"temp": 12.0}}, {"main": {"temp": 9.9}}],
    )
    _write_fixture(fixture_dir, "Paris", "FR", [{"main": {"temp": 15.0}}])

    second = run_until(5)
    # exactly the 2 new rows arrived — nothing replayed from the checkpoint
    assert len(second) == 5
    new = [r for r in second if json.loads(r.payload)["main"]["temp"] in (9.9, 15.0)]
    assert {r.city_name for r in new} == {"London", "Paris"}
