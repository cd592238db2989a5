"""Spark 4 Python DataSource for the weather-API extract phase.

Makes the reference's REST ingestion (src/extract.py:88-137, SURVEY S1) a
first-class Spark source instead of a driver-side loop:

    spark.dataSource.register(WeatherApiDataSource)
    spark.read.format("weather_api").option("fixture_dir", d).load()
    spark.readStream.format("weather_api")...   # replayable micro-batches

Design:

- **One InputPartition per city** — each executor task runs its own
  city's fetch+enrich loop, so a 10,000-station deployment ingests with
  cluster parallelism, not a driver bottleneck (the IngestProducer in
  sources/producer.py remains the single-process counterpart; retry and
  backoff semantics live there and in the reference mapping).
- **Transport is data, not code**: the Python DataSource API passes only
  string options to executors, so the HTTP call can't be injected as a
  callable. ``fixture_dir`` points at per-city JSON files (the same
  test-double policy as the producer's injected ``fetch``); a live HTTP
  mode would swap ``_load_city_payloads`` for a urllib call — gated here
  like the Kafka transport (no network in the sandbox), and the seam is
  one function.
- **Streaming offsets are per-city payload counts** — the stream reader's
  offset is ``{city: n_consumed}``; ``latestOffset`` re-lists the fixture
  files, so appending payloads to a city file yields exactly the new rows
  in the next micro-batch, and a checkpoint restart replays nothing. This
  is the Kafka-partition-offset shape expressed over files.

Output schema (raw bronze rows; silver parses ``payload`` with
from_json/VARIANT downstream):

    city_name string, country_code string,
    extraction_timestamp string, payload string

Enrichment mirrors reference src/extract.py:123-127 (the three added
fields); ``fixed_now`` (ISO string) pins the timestamp for deterministic
tests, otherwise current UTC is stamped per task.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "city_name string, country_code string, "
    "extraction_timestamp string, payload string"
)


@dataclass
class _CitySlice(InputPartition):
    city: str
    country: str
    path: str
    start: int
    end: int  # exclusive; -1 = all


def _load_city_payloads(path: str) -> list[dict]:
    """The transport seam. Fixture file = JSON array of API payloads for
    one city (a recorded HTTP session); a live mode would fetch here."""
    with open(path) as f:
        payloads = json.load(f)
    if not isinstance(payloads, list):
        payloads = [payloads]
    return payloads


def _city_files(fixture_dir: str) -> list[tuple[str, str, str]]:
    """(city, country, path) per ``{city}_{country}.json`` fixture file,
    sorted for deterministic partition order."""
    out = []
    for name in sorted(os.listdir(fixture_dir)):
        if not name.endswith(".json"):
            continue
        stem = name[: -len(".json")]
        city, _, country = stem.rpartition("_")
        out.append((city or stem, country, os.path.join(fixture_dir, name)))
    return out


def _rows(part: _CitySlice, now_iso: str | None):
    payloads = _load_city_payloads(part.path)
    end = len(payloads) if part.end < 0 else min(part.end, len(payloads))
    stamp = now_iso or datetime.now(timezone.utc).replace(tzinfo=None).isoformat()
    for payload in payloads[part.start:end]:
        yield (part.city, part.country, stamp, json.dumps(payload))


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.fixture_dir = options["fixture_dir"]
        self.fixed_now = options.get("fixed_now")

    def partitions(self):
        return [
            _CitySlice(city, country, path, 0, -1)
            for city, country, path in _city_files(self.fixture_dir)
        ]

    def read(self, partition):
        yield from _rows(partition, self.fixed_now)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.fixture_dir = options["fixture_dir"]
        self.fixed_now = options.get("fixed_now")

    def initialOffset(self):
        return {city: 0 for city, _, _ in _city_files(self.fixture_dir)}

    def latestOffset(self):
        return {
            city: len(_load_city_payloads(path))
            for city, _, path in _city_files(self.fixture_dir)
        }

    def partitions(self, start, end):
        parts = []
        for city, country, path in _city_files(self.fixture_dir):
            lo, hi = start.get(city, 0), end.get(city, 0)
            if hi > lo:
                parts.append(_CitySlice(city, country, path, lo, hi))
        return parts

    def read(self, partition):
        yield from _rows(partition, self.fixed_now)

    def commit(self, end):
        pass  # offsets are re-derivable from the fixture files


def parse_api_rows(df):
    """Bridge the source's raw rows into the bronze shape the silver layer
    consumes (operators/silver.flatten_raw): parse ``payload`` with the
    declared RAW_WEATHER_SCHEMA (single from_json — codegen, no Python)
    and lift the nested fields alongside the enrichment columns. Works
    identically on the batch and streaming forms of the source."""
    from pyspark.sql import functions as F

    from ..schemas import RAW_WEATHER_SCHEMA

    parsed = F.from_json("payload", RAW_WEATHER_SCHEMA).alias("p")
    return df.select(
        "city_name", "country_code", "extraction_timestamp", parsed
    ).select(
        "city_name",
        "country_code",
        "extraction_timestamp",
        "p.dt",
        "p.main",
        "p.wind",
        "p.weather",
    )


class WeatherApiDataSource(DataSource):
    """``format("weather_api")`` — see module docstring."""

    @classmethod
    def name(cls):
        return "weather_api"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)
