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


def test_source_composes_with_silver_flatten(spark, tmp_path):
    """weather_api → parse_api_rows → silver.flatten_raw runs the
    reference's extract→transform path entirely through the engine's own
    source and operators."""
    from skylogix_real_time_weather_data_pipeline_spark.operators.silver import flatten_raw
    from skylogix_real_time_weather_data_pipeline_spark.sources.weather_api import (
        parse_api_rows,
    )

    d = tmp_path / "api"
    d.mkdir()
    payload = {
        "dt": 1717243200,  # 2024-06-01T12:00:00Z
        "main": {"temp": 11.5, "feels_like": 10.0, "temp_min": 9.0,
                 "temp_max": 13.0, "pressure": 1012.0, "humidity": 70.0},
        "wind": {"speed": 3.4, "deg": 180.0},
        "weather": [{"main": "Clouds", "description": "scattered clouds"}],
    }
    _write_fixture(d, "London", "GB", [payload])
    _register(spark)
    raw = (
        spark.read.format("weather_api")
        .option("fixture_dir", str(d))
        .option("fixed_now", NOW)
        .load()
    )
    flat = flatten_raw(parse_api_rows(raw))
    r = flat.collect()[0]
    assert r.city == "London" and r.country == "GB"
    assert r.temperature == 11.5 and r.wind_speed == 3.4
    assert r.weather_condition == "Clouds"
    assert str(r.timestamp) == "2024-06-01 12:00:00"  # epoch dt wins (P3)
