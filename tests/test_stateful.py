"""applyInPandasWithState: cumulative per-key stats across MULTIPLE
micro-batches (maxFilesPerTrigger=1 → one batch per file) accumulate
correctly in the state store."""

from __future__ import annotations

import json
import time

from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
    running_key_stats,
)


def _write_batch(src, name, rows):
    src.mkdir(exist_ok=True)
    with open(src / name, "w") as f:
        for k, v in rows:
            f.write(json.dumps({"k": k, "v": v}) + "\n")


def test_state_accumulates_across_micro_batches(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _write_batch(src, "b1.json", [("a", 1.0), ("a", 3.0), ("b", 10.0)])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_batch(src, "b2.json", [("a", 5.0), ("c", -2.0)])

    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_key_stats(stream, "k", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("state_mem")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.table("state_mem").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)

    # 'a' seen in both micro-batches: a partial update then the cumulative one
    a_final = max(by_key["a"], key=lambda r: r.n)
    assert a_final.n == 3 and a_final.total == 9.0 and a_final.mean == 3.0
    assert a_final.vmin == 1.0 and a_final.vmax == 5.0
    assert len(by_key["a"]) == 2                      # emitted per touching batch
    assert by_key["b"][0].n == 1 and by_key["b"][0].total == 10.0
    assert by_key["c"][0].n == 1 and by_key["c"][0].total == -2.0


def test_stateful_op_runs_on_rocksdb_state_store(spark, tmp_path):
    """The large-state backend (session.get_spark(state_store='rocksdb')):
    same stateful operator, same results, state held in RocksDB — the
    checkpoint carries zip'd RocksDB snapshots instead of the HDFS
    provider's .delta files."""
    import os

    from skylogix_real_time_weather_data_pipeline_spark.session import ROCKSDB_PROVIDER

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        src, ckpt = tmp_path / "src", tmp_path / "ckpt"
        _write_batch(src, "b1.json", [("a", 1.0), ("a", 3.0), ("b", 10.0)])
        stream = spark.readStream.schema("k string, v double").json(str(src))
        q = (
            running_key_stats(stream, "k", "v")
            .writeStream.format("memory").queryName("rocks_state_mem")
            .outputMode("update").option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = {r.key: r for r in spark.table("rocks_state_mem").collect()}
        assert rows["a"].n == 2 and rows["a"].mean == 2.0
        assert rows["b"].n == 1
        state_files = os.listdir(ckpt / "state" / "0" / "0")
        assert any(f.endswith(".zip") or f.endswith(".changelog") for f in state_files)
        assert not any(f.endswith(".delta") for f in state_files)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_transform_with_state_equals_apply_in_pandas_with_state(spark, tmp_path):
    """Spark 4's transformWithStateInPandas (typed state handles, RocksDB
    required) produces the same cumulative stats as the
    applyInPandasWithState formulation on the same multi-batch stream.

    Environment gate: the TWS Python runner needs protobuf, absent from
    this container — the operator stays importable and the test documents
    the gate (same policy as the Kafka transport)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor",
                        reason="transformWithStateInPandas runner needs protobuf")
    from skylogix_real_time_weather_data_pipeline_spark.session import ROCKSDB_PROVIDER
    from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
        running_key_stats_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        src, ckpt = tmp_path / "src", tmp_path / "ckpt"
        _write_batch(src, "b1.json", [("a", 1.0), ("a", 3.0), ("b", 10.0)])
        time.sleep(1.1)
        _write_batch(src, "b2.json", [("a", 5.0), ("c", -2.0)])
        stream = (
            spark.readStream.schema("k string, v double")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        q = (
            running_key_stats_tws(stream, "k", "v")
            .writeStream.format("memory").queryName("tws_mem")
            .outputMode("update").option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.table("tws_mem").collect()
        finals = {}
        for r in rows:
            if r.key not in finals or r.n > finals[r.key].n:
                finals[r.key] = r
        assert finals["a"].n == 3 and finals["a"].total == 9.0 and finals["a"].mean == 3.0
        assert finals["a"].vmin == 1.0 and finals["a"].vmax == 5.0
        assert finals["b"].n == 1 and finals["c"].total == -2.0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_listener_reports_state_size_gauges(spark, tmp_path):
    """The MetricsListener surfaces stateOperators totals (rows/bytes) —
    the RocksDB capacity-planning gauges — from any stateful query's
    progress events."""
    from skylogix_real_time_weather_data_pipeline_spark.streaming.listener import (
        attach_metrics_listener,
    )

    listener = attach_metrics_listener(spark)
    try:
        src, ckpt = tmp_path / "src", tmp_path / "ckpt"
        _write_batch(src, "b1.json", [("a", 1.0), ("b", 2.0), ("c", 3.0)])
        stream = spark.readStream.schema("k string, v double").json(str(src))
        q = (
            running_key_stats(stream, "k", "v")
            .writeStream.format("memory").queryName("state_gauge_mem")
            .outputMode("update").option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while time.time() < deadline:
            if listener.registry.values.get("weather_state_rows", 0) > 0:
                break
            time.sleep(0.5)
        # 3 distinct keys live in the state store after the batch
        assert listener.registry.values["weather_state_rows"] == 3.0
        assert listener.registry.values["weather_state_memory_bytes"] > 0
        assert listener.registry.values["weather_state_rows_updated"] >= 3.0
        # r12: provider-level RocksDB customMetrics gauges (the test
        # session runs the RocksDB provider — session.py default): the
        # 3-key commit must have written bytes; SST bytes legitimately
        # stay 0 at this state size (memtable never flushes) but the
        # gauge must exist; fsync latency accumulates >= 0
        vals = listener.registry.values
        assert vals["weather_state_rocksdb_bytes_written"] > 0
        assert vals["weather_state_rocksdb_sst_bytes"] >= 0
        assert vals["weather_state_rocksdb_commit_fsync_ms"] >= 0
    finally:
        spark.streams.removeListener(listener)


def test_default_running_key_stats_is_bucketed(spark, tmp_path):
    """r14 (r13 verdict #5): running_key_stats' DEFAULT posture is
    bucketed state — SCALING_r13 measured 19× over per-key puts at 1M
    keys. Pin the wiring, not just the function identity: on the default
    path the state operator's total row count is bounded by n_buckets
    (the touched-bucket count), never the key cardinality, while the
    per-key form stores one row per key; and the listener's state-rows
    gauge reflects the bucketed count."""
    from skylogix_real_time_weather_data_pipeline_spark.streaming.listener import (
        attach_metrics_listener,
    )
    from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
        running_key_stats_perkey,
    )

    n_keys = 200
    rows = [(f"k{i}", float(i)) for i in range(n_keys)]
    state_rows = {}
    listener = attach_metrics_listener(spark)
    try:
        for variant, fn in (
            ("default", lambda s, k, v: running_key_stats(s, k, v,
                                                          n_buckets=8)),
            ("perkey", running_key_stats_perkey),
        ):
            src, ckpt = tmp_path / f"s_{variant}", tmp_path / f"c_{variant}"
            _write_batch(src, "b1.json", rows)
            stream = (spark.readStream.schema("k string, v double")
                      .json(str(src)))
            q = (
                fn(stream, "k", "v")
                .writeStream.format("memory").queryName(f"dflt_{variant}")
                .outputMode("update").option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)
            prog = q.lastProgress
            state_rows[variant] = sum(
                op["numRowsTotal"] for op in prog["stateOperators"])
            assert spark.table(f"dflt_{variant}").count() == n_keys
    finally:
        spark.streams.removeListener(listener)
    assert state_rows["perkey"] == n_keys
    assert state_rows["default"] <= 8, (
        "default path must store bucket blobs, not per-key rows")
    # the listener observed both runs; the gauge exists and tracked state
    assert listener.registry.values.get("weather_state_rows", 0) > 0


def test_bucketed_stats_equal_per_key_stats(spark, tmp_path):
    """running_key_stats_bucketed must emit EXACTLY the same rows as the
    per-key operator across multiple micro-batches — bucketing is a state
    granularity choice, not a semantics change. Includes a key whose batch
    rows are all NULL (touched but unchanged), cross-batch accumulation,
    and more keys than buckets (forced array growth within buckets)."""
    from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
        running_key_stats_bucketed,
    )

    # knull: all-null in batch 1 (empty state round-trips through the
    # array-state NaN encoding), then receives a real value in batch 2 —
    # np.fmin/fmax must treat the stored NaN as identity, like the
    # per-key operator's None checks
    # adversarial keys for the sentinel encoding (r8 advisor): a GENUINE
    # key equal to the internal NULL sentinel literal and another
    # \x00-prefixed key — both must round-trip as real keys, distinct
    # from the true-NULL group
    # x\x00a / x\x00b: distinct keys that differ only past an embedded
    # NUL — pandas' str hash table merges those (C-string compare), so
    # the bucketed op hashes keys as BYTES internally
    b1 = ([(f"k{i}", float(i % 7)) for i in range(40)]
          + [("knull", None), (None, 7.0),
             ("\x00null", 1.0), ("\x00x", 2.0),
             ("x\x00a", 10.0), ("x\x00b", 20.0)])
    b2 = ([(f"k{i}", float(i % 5)) for i in range(0, 40, 2)]
          + [("knew", 9.0), ("knull", 4.5), (None, 3.0), (None, None),
             ("\x00null", 5.0)])
    results = {}
    from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
        running_key_stats_perkey,
    )

    for variant, fn in (
        ("perkey", running_key_stats_perkey),
        ("bucketed", lambda s, k, v: running_key_stats_bucketed(
            s, k, v, n_buckets=4)),
    ):
        src = tmp_path / f"src_{variant}"
        ckpt = tmp_path / f"ckpt_{variant}"
        _write_batch(src, "b1.json", b1)
        time.sleep(1.1)
        _write_batch(src, "b2.json", b2)
        stream = (
            spark.readStream.schema("k string, v double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            fn(stream, "k", "v")
            .writeStream.format("memory")
            .queryName(f"bq_{variant}")
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        results[variant] = sorted(
            ((r.key, r.n, r.total, r.vmin, r.vmax, r.mean)
             for r in spark.table(f"bq_{variant}").collect()),
            key=lambda t: (t[0] is None, t[0] or "", t[1]),
        )
    assert results["bucketed"] == results["perkey"]
    # the NULL key accumulates across batches and is emitted as key=None
    # by BOTH paths (the bucketed path rides a sentinel internally)
    nulls = [t for t in results["bucketed"] if t[0] is None]
    assert len(nulls) == 2 and max(t[1] for t in nulls) == 2
    # knull: one empty-stats emission (batch 1), then the stored-NaN
    # state absorbs its first real value (batch 2)
    knull = sorted(t for t in results["bucketed"] if t[0] == "knull")
    assert len(knull) == 2
    assert knull[0][1] == 0
    assert knull[1][1:] == (1, 4.5, 4.5, 4.5, 4.5)
    # the sentinel-literal key stays a REAL key (escaped internally, never
    # folded into the NULL group) and accumulates across batches
    sent = sorted(t for t in results["bucketed"] if t[0] == "\x00null")
    assert [t[1] for t in sent] == [1, 2]
    assert sent[1][2:] == (6.0, 1.0, 5.0, 3.0)
    assert any(t[0] == "\x00x" and t[1] == 1 for t in results["bucketed"])
    # keys differing only past an embedded NUL stay DISTINCT (bytes-keyed
    # pandas ops — the str-keyed form silently merged them)
    assert any(t[0] == "x\x00a" and t[2] == 10.0 for t in results["bucketed"])
    assert any(t[0] == "x\x00b" and t[2] == 20.0 for t in results["bucketed"])
