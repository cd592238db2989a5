"""Extract-phase integration: the file-backed producer drives the
reference's retry/enrich/save loop, and its output feeds the streaming
bronze → silver pipeline end-to-end (producer → raw JSON dir →
stream_raw_json → silver parquet)."""

from __future__ import annotations

import glob
import json
import tempfile

from skylogix_real_time_weather_data_pipeline_spark.sources.producer import IngestProducer
from skylogix_real_time_weather_data_pipeline_spark.streaming.pipeline import (
    run_bronze_to_silver_available_now,
)

CITIES = [
    {"name": "New York", "country": "US"},
    {"name": "London", "country": "GB"},
    {"name": "Atlantis", "country": "XX"},  # permanently down
]


def _payload(city):
    base = {"New York": 12.0, "London": 9.0}.get(city["name"], 0.0)
    return {
        "dt": 1709280000,
        "main": {
            "temp": base,
            "feels_like": base - 1.0,
            "temp_min": base - 2.0,
            "temp_max": base + 2.0,
            "pressure": 1013.0,
            "humidity": 60.0,
        },
        "wind": {"speed": 4.2, "deg": 180.0},
        "weather": [{"main": "Clear", "description": "synthetic"}],
    }


class FlakyApi:
    """Fails the first attempt for London, always fails for Atlantis."""

    def __init__(self):
        self.calls = {}

    def __call__(self, city):
        n = self.calls.get(city["name"], 0)
        self.calls[city["name"]] = n + 1
        if city["name"] == "Atlantis":
            raise ConnectionError("api down")
        if city["name"] == "London" and n == 0:
            raise TimeoutError("transient")
        return _payload(city)


def test_producer_retry_enrich_and_save():
    slept = []
    with tempfile.TemporaryDirectory() as d:
        prod = IngestProducer(
            FlakyApi(), CITIES, d, retry_attempts=3, backoff_seconds=2.0,
            sleep=slept.append,
        )
        docs = prod.extract_once()

        # Atlantis exhausted 3 attempts and was skipped; others succeeded
        assert [c["city_name"] for c in docs] == ["New York", "London"]
        assert prod.metrics.extract_successes == 2
        assert prod.metrics.extract_failures == 1
        assert prod.metrics.data_points_extracted == 2
        # backoff: 1 transient London failure + 2 pre-exhaustion Atlantis waits
        assert slept == [2.0, 2.0, 2.0]
        # retry accounting: London took 2 attempts, Atlantis 3
        assert ("London", 2) in prod.metrics.attempts
        assert ("Atlantis", 3) in prod.metrics.attempts

        files = sorted(glob.glob(f"{d}/*.json"))
        assert len(files) == 2
        by_city = {}
        for p in files:
            with open(p) as f:
                doc = json.load(f)
            # enrichment keys present alongside the raw payload
            assert {"extraction_timestamp", "city_name", "country_code"} <= doc.keys()
            by_city[doc["city_name"]] = doc
        assert by_city["New York"]["main"]["temp"] == 12.0
        assert by_city["London"]["main"]["temp"] == 9.0


def test_producer_to_silver_end_to_end(spark):
    """Two extract passes land files; one availableNow run ingests both and
    produces silver rows for every successful observation."""
    with tempfile.TemporaryDirectory() as root:
        raw, out, ckpt = f"{root}/raw", f"{root}/silver", f"{root}/ckpt"
        prod = IngestProducer(FlakyApi(), CITIES, raw, retry_attempts=3, sleep=lambda s: None)
        prod.extract_once()   # NY, London (after retry)
        prod.extract_once()   # NY, London (London succeeds now: attempt state advanced)

        q = run_bronze_to_silver_available_now(spark, raw, out, ckpt)
        q.awaitTermination(120)

        silver = spark.read.parquet(out)
        assert silver.count() == 4
        cities = {r.city for r in silver.select("city").distinct().collect()}
        assert cities == {"New York", "London"}
        # silver schema carries the flattened measures + derived date
        for col in ("temperature", "humidity", "date", "timestamp"):
            assert col in silver.columns
