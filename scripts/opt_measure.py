#!/usr/bin/env python
"""Optimization-round measurement harness (r14; plan dir bumped per round).

Times a named subset of registry queries exactly like bench.py (median of
3 count + median of 3 noop-materialize, owned caches drained between
reps, same session construction incl. the scan-split sizing) and/or
captures .explain("formatted") for each to plans/r15/<name>_<tag>.txt.

Usage:
  python scripts/opt_measure.py explain <tag> q1 q2 ...   # plans only
  python scripts/opt_measure.py time q1 q2 ...            # timings only
  python scripts/opt_measure.py both <tag> q1 q2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLAN_DIR = os.path.join(_ROOT, "plans", "r15")


def main() -> int:
    mode = sys.argv[1]
    if mode in ("explain", "both"):
        tag = sys.argv[2]
        names = sys.argv[3:]
    else:
        tag = None
        names = sys.argv[2:]

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
        app_name="skylogix-opt-measure",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(split)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    _warm = pandas_udf(lambda s: s * 1.0, "double")
    spark.range(1000).select(_warm(F.col("id").cast("double"))).count()

    def _cal() -> float:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet").agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).collect()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        return best

    def _median_time(run) -> tuple[float, int]:
        times, n = [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = run()
            times.append(time.perf_counter() - t0)
            release_owned_caches(spark)
        return statistics.median(times), n

    if mode in ("explain", "both"):
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            release_owned_caches(spark)
            print(f"# wrote {path}", file=sys.stderr)

    if mode in ("time", "both"):
        print(f"# calibration: {_cal():.3f}s", file=sys.stderr)
        out = {}
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"opt-measure {name}")
            med, n = _median_time(lambda: fn(spark, SF_DIR).count())
            med_m, _ = _median_time(
                lambda: fn(spark, SF_DIR)
                .write.format("noop")
                .mode("overwrite")
                .save()
                or n
            )
            out[name] = {"count": round(med, 3), "noop": round(med_m, 3)}
            print(f"# {name}: {med:.3f}s count / {med_m:.3f}s noop ({n} rows)",
                  file=sys.stderr)
        print(f"# calibration (end): {_cal():.3f}s", file=sys.stderr)
        import json

        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
