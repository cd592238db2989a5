"""Observability: StreamingQueryListener → metrics registry.

The reference exports Prometheus counters/gauges per phase (reference
main.py:28-30, src/extract.py:39-42, src/transform.py:27-32,
src/analyze.py:41-44, src/load.py:26-29). Natively, streaming progress
events carry the same facts (rows in, batch duration); this listener maps
them onto the reference's metric names. If ``prometheus_client`` is
installed they're exported for scraping; otherwise an in-memory registry
keeps the same counters (tests use this path).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener

try:  # pragma: no cover - optional dependency
    from prometheus_client import Counter, Gauge, start_http_server

    _HAVE_PROM = True
except ImportError:
    _HAVE_PROM = False


class _MemoryRegistry:
    """Minimal counter/gauge registry with the reference's metric names."""

    def __init__(self) -> None:
        self.values: dict[str, float] = defaultdict(float)

    def inc(self, name: str, v: float = 1.0) -> None:
        self.values[name] += v

    def set(self, name: str, v: float) -> None:
        self.values[name] = v


class MetricsListener(StreamingQueryListener):
    """Maps streaming progress onto the reference metric names:

    - ``weather_records_processed``  ← progress.numInputRows
      (reference src/transform.py:30,149)
    - ``weather_pipeline_duration_seconds`` ← batch duration
      (reference main.py:30,53)
    - ``weather_pipeline_failures`` ← query termination with exception
      (reference main.py:29,129)

    Beyond the reference's names, stateful-operator gauges (the numbers that
    matter when streaming state lives in RocksDB — see
    ``session.get_spark(state_store="rocksdb")``):

    - ``weather_state_rows`` ← Σ stateOperators.numRowsTotal (current keys
      held in the state store across all stateful operators)
    - ``weather_state_memory_bytes`` ← Σ memoryUsedBytes (heap for the HDFS
      provider; block-cache+memtable estimate for RocksDB)
    - ``weather_state_rows_updated`` ← Σ numRowsUpdated per batch
      (cumulative write pressure on the store)

    At 100 TB these are the capacity-planning signals: unbounded
    ``weather_state_rows`` growth means a missing watermark / TTL; the
    bytes gauge sizes the executor off-heap budget for RocksDB.
    """

    def __init__(self) -> None:
        self.registry = _MemoryRegistry()
        if _HAVE_PROM:  # pragma: no cover
            self._records = Counter("weather_records_processed", "Rows ingested")
            self._duration = Gauge("weather_pipeline_duration_seconds", "Batch duration")
            self._failures = Counter("weather_pipeline_failures", "Query failures")
            self._state_rows = Gauge("weather_state_rows", "Streaming state rows")
            self._state_bytes = Gauge("weather_state_memory_bytes", "Streaming state bytes")

    def onQueryStarted(self, event) -> None:
        self.registry.inc("weather_pipeline_runs")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rows = p.numInputRows or 0
        secs = (p.batchDuration or 0) / 1000.0
        self.registry.inc("weather_records_processed", rows)
        self.registry.set("weather_pipeline_duration_seconds", secs)
        ops = p.stateOperators or []
        if ops:
            state_rows = float(sum(o.numRowsTotal or 0 for o in ops))
            state_bytes = float(sum(o.memoryUsedBytes or 0 for o in ops))
            self.registry.set("weather_state_rows", state_rows)
            self.registry.set("weather_state_memory_bytes", state_bytes)
            self.registry.inc(
                "weather_state_rows_updated",
                float(sum(o.numRowsUpdated or 0 for o in ops)),
            )
            # provider-level RocksDB signals (r12, ROADMAP item): with
            # session.get_spark(state_store="rocksdb") the progress event
            # carries per-operator customMetrics — surface the
            # capacity-planning trio: on-disk SST bytes (the real state
            # footprint once memtables flush; memoryUsedBytes is only the
            # cache side), cumulative write volume, and the commit fsync
            # latency the micro-batch critical path pays. Absent keys
            # (HDFS provider) leave the gauges untouched.
            for gauge, key, kind in (
                ("weather_state_rocksdb_sst_bytes", "rocksdbSstFileSize", "set"),
                ("weather_state_rocksdb_bytes_written",
                 "rocksdbTotalBytesWritten", "set"),
                ("weather_state_rocksdb_commit_fsync_ms",
                 "rocksdbCommitFileSyncLatencyMs", "inc"),
                # r14 (r13 verdict #5): per-batch put count — the signal
                # that the BUCKETED default posture is in effect (puts
                # bounded by n_buckets, not key cardinality: 1024 vs 1M
                # in SCALING_r13's probe)
                ("weather_state_rocksdb_put_count", "rocksdbPutCount", "set"),
            ):
                vals = [
                    (o.customMetrics or {}).get(key)
                    for o in ops
                    if getattr(o, "customMetrics", None)
                ]
                vals = [v for v in vals if v is not None]
                if vals:
                    getattr(self.registry, kind)(gauge, float(sum(vals)))
        if _HAVE_PROM:  # pragma: no cover
            self._records.inc(rows)
            self._duration.set(secs)
            if ops:
                self._state_rows.set(state_rows)
                self._state_bytes.set(state_bytes)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception is not None:
            self.registry.inc("weather_pipeline_failures")
            if _HAVE_PROM:  # pragma: no cover
                self._failures.inc()


def attach_metrics_listener(spark) -> MetricsListener:
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener


def start_metrics_server(port: int = 8000, registry: _MemoryRegistry | None = None):
    """Prometheus scrape endpoint (reference src/utils.py:161-173).

    With ``prometheus_client`` installed, its native exporter serves the
    real collectors. Without it, a stdlib HTTP server exposes ``registry``
    (a listener's ``_MemoryRegistry``) at ``/metrics`` in the Prometheus
    text exposition format — same scrape contract, zero dependencies.
    Returns the server object (call ``.shutdown()``), True for the
    prometheus_client path, or False when there is nothing to serve.
    Pass ``port=0`` for an ephemeral port (``server_address[1]``).
    """
    if _HAVE_PROM:  # pragma: no cover - optional dependency
        start_http_server(port)
        return True
    if registry is None:
        return False
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - http.server API
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_response(404)
                self.end_headers()
                return
            body = "".join(
                f"# TYPE {k} gauge\n{k} {v}\n" for k, v in sorted(registry.values.items())
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet: scrapes every 5 s
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
