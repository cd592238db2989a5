#!/usr/bin/env python
"""Stage-level profiler for optimization work (r14).

Runs named registry queries once (noop sink, owned caches drained
between queries) with the Spark event log enabled, then parses the log
and prints, per query, the stages sorted by executor-time contribution:
stage id, duration, task time, shuffle read/write bytes, input bytes,
and the first line of the stage's callsite — enough to attribute cost
to operators without the UI.

Usage: python scripts/opt_profile.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    names = sys.argv[1:]
    evdir = tempfile.mkdtemp(prefix="opt_eventlog_")

    from skylogix_real_time_weather_data_pipeline_spark.cache import (
        release_owned_caches,
    )
    from skylogix_real_time_weather_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    biggest = max(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    split = max(1 << 20, biggest // (int(CPUS) * 2))
    spark = get_spark(
        app_name="skylogix-opt-profile",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm like the bench
    from pyspark.sql import functions as F

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile {name}")
        # one warm rep (codegen compile), then the measured rep
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_owned_caches(spark)
        t0 = time.time() * 1000
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t1 = time.time() * 1000
        release_owned_caches(spark)
        spans[name] = (t0, t1)
        print(f"# {name}: {(t1 - t0) / 1000:.3f}s warm noop", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    appid = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----
    logf = os.path.join(evdir, appid)
    if not os.path.exists(logf):
        cands = [os.path.join(evdir, f) for f in os.listdir(evdir)]
        logf = max(cands, key=os.path.getmtime)
    if os.path.isdir(logf):
        # Spark 4 rolling event log: a directory of events_* part files
        parts = sorted(
            os.path.join(logf, f)
            for f in os.listdir(logf)
            if f.startswith("events_")
        )
    else:
        parts = [logf]

    def _lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    def _blank():
        return {
            "name": "",
            "submit": 0,
            "complete": 0,
            "ntasks": 0,
            "task_ms": 0,
            "sh_read": 0,
            "sh_write": 0,
            "input": 0,
            "spill": 0,
            "py_ms": 0,
        }

    stages = {}  # (stageId, attempt) -> record
    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                rec = stages.setdefault(key, _blank())
                rec["name"] = si.get("Stage Name", "")
                rec["submit"] = si.get("Submission Time", 0)
                rec["complete"] = si.get("Completion Time", 0)
                rec["ntasks"] = si.get("Number of Tasks", 0)
            elif et == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                rec = stages.setdefault(key, _blank())
                m = ev.get("Task Metrics") or {}
                if not m:
                    continue
                rec["task_ms"] += m.get("Executor Run Time", 0)
                rec["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (m.get("Shuffle Read Metrics") or {}).get(
                    "Local Bytes Read", 0
                )
                rec["sh_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                rec["input"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                )
                rec["spill"] += m.get("Disk Bytes Spilled", 0)

    for name, (t0, t1) in spans.items():
        print(f"\n=== {name} ({(t1 - t0) / 1000:.3f}s wall) ===")
        rows = [
            (k, r)
            for k, r in stages.items()
            if r["submit"] >= t0 and r["complete"] <= t1
        ]
        rows.sort(key=lambda kr: -kr[1]["task_ms"])
        for (sid, att), r in rows[:14]:
            dur = (r["complete"] - r["submit"]) / 1000
            print(
                f"stage {sid:>4} dur {dur:6.2f}s task {r['task_ms']/1000:7.2f}s "
                f"n {r['ntasks']:>4} in {r['input']/1e6:8.1f}MB "
                f"shR {r['sh_read']/1e6:7.1f}MB shW {r['sh_write']/1e6:7.1f}MB "
                f"spill {r['spill']/1e6:6.1f}MB  {r['name'][:70]}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
