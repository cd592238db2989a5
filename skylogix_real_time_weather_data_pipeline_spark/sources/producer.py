"""File-backed ingest producer — the executable counterpart of the
reference's extract phase.

Mirrors reference src/extract.py:88-132 semantics exactly: per-city fetch
with bounded retry + fixed backoff (src/extract.py:88-108), enrichment of
each successful payload with ``extraction_timestamp`` / ``city_name`` /
``country_code`` (src/extract.py:123-127), one raw JSON file per
observation named ``{city}_{country}_{timestamp}.json``
(src/extract.py:139-148), and success/failure counters matching the
reference's Prometheus metric names (src/utils.py).

The HTTP call is INJECTED as ``fetch`` rather than hard-coded: production
passes a requests-based callable hitting the weather API; tests (and
sandboxes without network) drive the identical retry/enrich/save loop with
a deterministic fake. The emitted directory is exactly what
``sources.streaming.stream_raw_json`` ingests, so producer → bronze →
silver runs end-to-end without Kafka (which stays gated,
sources/streaming.py:30).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from datetime import datetime, timezone


def http_fetch(base_url: str, timeout: float = 10.0) -> Callable[[dict], dict]:
    """Live HTTP transport for :class:`IngestProducer`: one GET per call
    against ``base_url`` with ``{city}``/``{country}`` placeholders.

    Deliberately single-attempt — the bounded-retry/backoff policy lives in
    ``_fetch_with_retry`` (reference src/extract.py:88-108), so a transport
    error here surfaces as one failed attempt there."""
    import urllib.request
    from urllib.parse import quote

    def fetch(city: dict) -> dict:
        # percent-encode substituted values ('New York', 'São Paulo') —
        # the reference encodes via requests params
        url = base_url.format(
            city=quote(city["name"]), country=quote(city.get("country", ""))
        )
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    return fetch


@dataclass
class ProducerMetrics:
    """Counter names track the reference's Prometheus metrics
    (src/utils.py: EXTRACT_SUCCESSES, EXTRACT_FAILURES,
    DATA_POINTS_EXTRACTED, API_RESPONSE_TIME)."""

    extract_successes: int = 0
    extract_failures: int = 0
    data_points_extracted: int = 0
    api_response_time: float = 0.0
    attempts: list[tuple[str, int]] = field(default_factory=list)


class IngestProducer:
    """Pull observations for configured cities and land them as raw JSON
    files — one file per observation, append-only, ready for the streaming
    bronze source.

    ``fetch(city)`` returns the raw API payload dict or raises on transport
    error (the equivalent of requests.RequestException in
    src/extract.py:101).
    """

    def __init__(
        self,
        fetch: Callable[[dict], dict],
        cities: Sequence[dict],
        out_dir: str,
        retry_attempts: int = 3,
        backoff_seconds: float = 2.0,
        sleep: Callable[[float], None] = time.sleep,
        now: Callable[[], datetime] | None = None,
    ) -> None:
        self.fetch = fetch
        self.cities = list(cities)
        self.out_dir = out_dir
        self.retry_attempts = retry_attempts
        self.backoff_seconds = backoff_seconds
        self.sleep = sleep
        self.now = now or (lambda: datetime.now(timezone.utc))
        self.metrics = ProducerMetrics()
        self._seq = 0
        os.makedirs(out_dir, exist_ok=True)

    def _fetch_with_retry(self, city: dict) -> dict | None:
        """Reference retry loop (src/extract.py:88-108): up to
        ``retry_attempts`` tries, fixed backoff between, empty result after
        exhaustion (the caller skips the city, never aborts the batch)."""
        for attempt in range(self.retry_attempts):
            try:
                t0 = time.perf_counter()
                payload = self.fetch(city)
                self.metrics.api_response_time = time.perf_counter() - t0
                self.metrics.extract_successes += 1
                self.metrics.attempts.append((city["name"], attempt + 1))
                return payload
            except Exception:
                if attempt == self.retry_attempts - 1:
                    self.metrics.extract_failures += 1
                    self.metrics.attempts.append((city["name"], attempt + 1))
                    return None
                self.sleep(self.backoff_seconds)
        return None

    def extract_once(self) -> list[dict]:
        """One extract pass over all cities (src/extract.py:110-137):
        fetch → enrich → save file; failed cities are skipped."""
        out = []
        for city in self.cities:
            payload = self._fetch_with_retry(city)
            if not payload:
                continue
            doc = dict(payload)
            ts = self.now()
            doc["extraction_timestamp"] = ts.replace(tzinfo=None).isoformat()
            doc["city_name"] = city["name"]
            doc["country_code"] = city["country"]
            self._save_raw(doc, city, ts)
            out.append(doc)
        self.metrics.data_points_extracted = len(out)
        return out

    def _save_raw(self, doc: dict, city: dict, ts: datetime) -> None:
        """Reference raw sink naming (src/extract.py:139-148) plus a
        sequence suffix so two observations in the same second never
        collide (the reference overwrites silently)."""
        self._seq += 1
        stamp = ts.strftime("%Y%m%d_%H%M%S")
        name = f"{city['name']}_{city['country']}_{stamp}_{self._seq:05d}.json"
        with open(os.path.join(self.out_dir, name), "w") as f:
            json.dump(doc, f)
