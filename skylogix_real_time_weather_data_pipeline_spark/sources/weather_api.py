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
  callable. Two transports share one row pipeline:
  ``fixture_dir`` points at per-city JSON files (a recorded HTTP
  session — the same test-double policy as the producer's injected
  ``fetch``), while ``base_url`` + ``cities`` turns each city partition
  into a live urllib GET with the reference's bounded-retry/fixed-backoff
  loop (src/extract.py:88-108) running IN the executor task
  (``retry_attempts`` / ``backoff_seconds`` / ``timeout_seconds``
  options). tests/test_weather_api_source.py exercises the live path
  against a localhost http.server, including 2-failures-then-success.
- **Streaming offsets are per-city payload counts** (fixture mode) — the
  stream reader's offset is ``{city: n_consumed}``; ``latestOffset``
  re-lists the fixture files, so appending payloads to a city file yields
  exactly the new rows in the next micro-batch, and a checkpoint restart
  replays nothing. This is the Kafka-partition-offset shape expressed over
  files.
- **Live streaming offsets are poll timestamps with driver-captured
  snapshots** — a current-conditions endpoint is not a replayable log
  (re-GETting returns *today's* weather, not the micro-batch's), so in
  ``base_url`` mode every ``latestOffset`` poll performs ONE GET per city,
  buffers the fetched payloads on the driver, and advances that city's
  offset to the poll's epoch-millis stamp. ``partitions`` then embeds the
  buffered payloads for the planned ``(start, end]`` range INTO the
  InputPartition, so executors read exactly the snapshot the offset was
  computed from — never a second, possibly different, GET. ``commit``
  prunes buffered polls at or below the committed offset. Each poll's
  payloads are new observations (repeated polls of a 1-payload endpoint
  keep emitting rows — the stream does not stall at offset 1). Because the
  transport is non-replayable, a checkpoint restart cannot re-fetch an
  in-flight uncommitted micro-batch: the planned range yields zero rows
  and the stream resumes with fresh polls (the same recovery posture as
  Spark's socket source; the fixture mode above is the replayable,
  exactly-once form).

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


@dataclass
class _BufferedSlice(InputPartition):
    """Live-stream partition: the payloads were fetched ONCE on the driver
    at ``latestOffset`` time and travel inside the (pickled) partition, so
    the executor read consumes exactly the snapshot the offset described —
    no second GET, no torn snapshot."""

    city: str
    country: str
    payloads: list[str]  # JSON-encoded payloads captured at poll time


def _http_get_json(url: str, timeout: float, retry_attempts: int,
                   backoff_seconds: float) -> dict | list | None:
    """Live transport: bounded retry + fixed backoff between attempts.

    Returns ``None`` after exhaustion — mirroring the reference
    (src/extract.py:88-108) and the producer twin
    ``IngestProducer._fetch_with_retry``, which skip the failed city rather
    than abort the whole extract pass. A dead city therefore degrades to
    zero rows for that partition (logged), never a failed Spark task."""
    import logging
    import time
    import urllib.request

    last: Exception | None = None
    for attempt in range(retry_attempts):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except Exception as exc:  # urllib.error.URLError, HTTP 5xx, timeout
            last = exc
            if attempt < retry_attempts - 1:
                time.sleep(backoff_seconds)
    logging.getLogger(__name__).warning(
        "weather_api: %d/%d attempts failed for %s (skipping): %s",
        retry_attempts, retry_attempts, url, last,
    )
    return None


def _load_city_payloads(path: str, timeout: float = 10.0,
                        retry_attempts: int = 3,
                        backoff_seconds: float = 2.0) -> list[dict]:
    """The transport seam: ``http(s)://`` → live GET with retry; otherwise
    a fixture file (= JSON array of API payloads for one city, a recorded
    HTTP session)."""
    if path.startswith(("http://", "https://")):
        payloads = _http_get_json(path, timeout, retry_attempts, backoff_seconds)
        if payloads is None:  # retry exhaustion → skip-city (zero rows)
            return []
    else:
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


@dataclass
class _Transport:
    """Per-reader transport config parsed once from the string options."""

    timeout: float
    retry_attempts: int
    backoff_seconds: float

    @classmethod
    def from_options(cls, options) -> "_Transport":
        return cls(
            timeout=float(options.get("timeout_seconds", "10")),
            retry_attempts=int(options.get("retry_attempts", "3")),
            backoff_seconds=float(options.get("backoff_seconds", "2")),
        )


def _list_sources(options) -> list[tuple[str, str, str]]:
    """(city, country, path_or_url) per configured city.

    ``fixture_dir`` mode lists ``{city}_{country}.json`` files; ``base_url``
    mode expands ``{city}``/``{country}`` placeholders per entry of the
    ``cities`` option (``Name:CC,Name2:CC``)."""
    base_url = options.get("base_url")
    if base_url:
        from urllib.parse import quote

        out = []
        for spec in options["cities"].split(","):
            city, _, country = spec.strip().partition(":")
            # percent-encode the substituted values: 'New York' / 'São
            # Paulo' must produce a valid URL (the reference encodes via
            # requests params)
            out.append(
                (city, country,
                 base_url.format(city=quote(city), country=quote(country)))
            )
        return out
    return _city_files(options["fixture_dir"])


def _rows(part: _CitySlice, now_iso: str | None, tr: _Transport):
    payloads = _load_city_payloads(
        part.path, tr.timeout, tr.retry_attempts, tr.backoff_seconds
    )
    end = len(payloads) if part.end < 0 else min(part.end, len(payloads))
    stamp = now_iso or datetime.now(timezone.utc).replace(tzinfo=None).isoformat()
    for payload in payloads[part.start:end]:
        yield (part.city, part.country, stamp, json.dumps(payload))


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        self.fixed_now = options.get("fixed_now")
        self.transport = _Transport.from_options(options)

    def partitions(self):
        return [
            _CitySlice(city, country, path, 0, -1)
            for city, country, path in _list_sources(self.options)
        ]

    def read(self, partition):
        yield from _rows(partition, self.fixed_now, self.transport)


class _StreamReader(DataSourceStreamReader):
    """Fixture mode: replayable per-city payload-count offsets (see module
    docstring). Live (``base_url``) mode: poll-timestamp offsets over a
    driver-side snapshot buffer — every poll's payloads are NEW
    observations, captured once and shipped inside the partition."""

    def __init__(self, options):
        self.options = options
        self.fixed_now = options.get("fixed_now")
        self.transport = _Transport.from_options(options)
        self._live = bool(options.get("base_url"))
        # live mode: city -> [(poll_ms, [payload_json, ...]), ...] buffered
        # between latestOffset (append) and commit (prune)
        self._polls: dict[str, list[tuple[int, list[str]]]] = {}
        self._last_ms = 0

    def initialOffset(self):
        return {city: 0 for city, _, _ in _list_sources(self.options)}

    def latestOffset(self):
        import time as _time

        tr = self.transport
        if not self._live:
            return {
                city: len(
                    _load_city_payloads(path, tr.timeout, tr.retry_attempts, tr.backoff_seconds)
                )
                for city, _, path in _list_sources(self.options)
            }
        # Live: ONE GET per city per poll; offset advances to the poll's
        # epoch-millis (strictly monotonic — a restart resumes monotonic
        # because wall-clock exceeds any checkpointed past stamp). The
        # fetched payloads are buffered so partitions()/read() use this
        # exact snapshot.
        poll_ms = max(int(_time.time() * 1000), self._last_ms + 1)
        self._last_ms = poll_ms
        out = {}
        for city, _country, url in _list_sources(self.options):
            fetched = _load_city_payloads(
                url, tr.timeout, tr.retry_attempts, tr.backoff_seconds
            )  # [] on retry exhaustion → city skipped this poll
            if fetched:
                self._polls.setdefault(city, []).append(
                    (poll_ms, [json.dumps(p) for p in fetched])
                )
            out[city] = poll_ms
        return out

    def partitions(self, start, end):
        parts = []
        if self._live:
            for city, country, _url in _list_sources(self.options):
                lo, hi = start.get(city, 0), end.get(city, 0)
                captured = [
                    p
                    for ms, batch in self._polls.get(city, ())
                    if lo < ms <= hi
                    for p in batch
                ]
                # A restart's in-flight range finds an empty buffer (the
                # transport is non-replayable): plan nothing, stream
                # resumes on fresh polls.
                if captured:
                    parts.append(_BufferedSlice(city, country, captured))
            return parts
        for city, country, path in _list_sources(self.options):
            lo, hi = start.get(city, 0), end.get(city, 0)
            if hi > lo:
                parts.append(_CitySlice(city, country, path, lo, hi))
        return parts

    def read(self, partition):
        if isinstance(partition, _BufferedSlice):
            stamp = self.fixed_now or datetime.now(timezone.utc).replace(
                tzinfo=None
            ).isoformat()
            for payload in partition.payloads:
                yield (partition.city, partition.country, stamp, payload)
            return
        yield from _rows(partition, self.fixed_now, self.transport)

    def commit(self, end):
        # fixture mode: offsets re-derivable from files — nothing to do.
        # live mode: drop buffered polls at or below the committed stamp.
        if self._live:
            for city, polls in list(self._polls.items()):
                hi = end.get(city, 0)
                kept = [(ms, b) for ms, b in polls if ms > hi]
                if kept:
                    self._polls[city] = kept
                else:
                    self._polls.pop(city, None)


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
