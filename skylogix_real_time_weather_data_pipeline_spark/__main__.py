"""CLI pipeline runner — the reference's ``python main.py`` entry point
(reference main.py:135-157), Spark-native.

Phases map onto the medallion flow in ONE process with lazy plans:

  extract   synthesize/ingest raw JSON documents into the bronze dir
            (stands in for the OpenWeatherMap producer; reference
            src/extract.py — the HTTP fetch itself is out of engine scope)
  transform bronze → silver (flatten/clean/derive) → partitioned parquet
  analyze   gold aggregates (stats, city comparison, trends, conditions)
            → JSON results dir
  load      serve-layer sinks: CSV report, JSONL records, SQLite

Usage:
  python -m skylogix_real_time_weather_data_pipeline_spark --workdir /tmp/wx [--synthesize 100] [--streaming]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="skylogix-spark")
    ap.add_argument("--workdir", required=True, help="pipeline working directory")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic raw documents first (test mode)")
    ap.add_argument("--streaming", action="store_true",
                    help="run transform as an availableNow streaming query")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .operators import gold
    from .operators.silver import silver_pipeline
    from .session import get_spark
    from .sinks import write_csv_report, write_json_records, write_parquet, write_sqlite
    from .sources import read_raw_json

    t0 = time.time()
    spark = get_spark(app_name="skylogix-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    raw_dir = f"{args.workdir}/raw"
    silver_dir = f"{args.workdir}/silver"
    results_dir = f"{args.workdir}/results"

    # ---- extract -----------------------------------------------------------
    if args.synthesize:
        import os
        import random

        sys.path.insert(0, ".")
        from tests.fixtures import make_raw_docs, write_raw_json_dir

        n_days = max(2, args.synthesize // 10)
        write_raw_json_dir(raw_dir, make_raw_docs(n_days=n_days, per_day=1,
                                                  seed=random.Random(42).randint(0, 9999)))
        print(f"extract: synthesized docs in {raw_dir} ({len(os.listdir(raw_dir))} files)")

    # ---- transform ---------------------------------------------------------
    if args.streaming:
        from .streaming import run_bronze_to_silver_available_now

        q = run_bronze_to_silver_available_now(
            spark, raw_dir, silver_dir, f"{args.workdir}/ckpt"
        )
        q.awaitTermination(300)
        silver = spark.read.parquet(silver_dir)
    else:
        silver = silver_pipeline(read_raw_json(spark, raw_dir))
        write_parquet(silver, silver_dir, partition_by=["date"])
        silver = spark.read.parquet(silver_dir)
    n_records = silver.count()
    print(f"transform: {n_records} silver records → {silver_dir}")

    # ---- analyze -----------------------------------------------------------
    results = {
        "basic_stats": gold.basic_stats(silver).first().asDict(),
        "city_comparison": [r.asDict() for r in gold.city_comparison(silver).collect()],
        "warmest_coldest": [r.asDict() for r in gold.warmest_coldest(silver).collect()],
        "temperature_trends": [r.asDict() for r in gold.temperature_trends(silver).collect()],
        "condition_distribution": [r.asDict() for r in gold.condition_histogram(silver).collect()],
        "condition_mode_by_city": [r.asDict() for r in gold.condition_mode_by_city(silver).collect()],
    }
    import os

    os.makedirs(results_dir, exist_ok=True)
    with open(f"{results_dir}/analysis_results.json", "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"analyze: results → {results_dir}/analysis_results.json")

    # ---- load --------------------------------------------------------------
    write_csv_report(silver, f"{args.workdir}/report_csv")
    write_json_records(silver, f"{args.workdir}/report_json")
    n_sql = write_sqlite(silver, f"{args.workdir}/weather.db")
    print(f"load: csv + jsonl + sqlite ({n_sql} rows)")

    print(f"pipeline complete in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
