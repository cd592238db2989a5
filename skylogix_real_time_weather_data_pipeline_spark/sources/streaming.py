"""Streaming sources (SURVEY.md §2.1 S1/S3 streaming forms, §2.9).

The reference's "stream" is a cron re-running a batch over an append-only
directory (SURVEY §1.1); the native equivalents:

- file source over the raw JSON directory — exactly-once, new-files-only
  (replaces re-globbing ALL history every run, reference src/transform.py:64-66);
- Kafka source for the live API feed (the ingest producer publishes
  OpenWeatherMap JSON to a topic) — gated on the kafka connector package;
- rate source for tests / synthetic load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RAW_WEATHER_SCHEMA


def stream_raw_json(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """S3 (streaming): incremental raw-document ingest. Explicit schema is
    mandatory for streaming; checkpointing gives exactly-once."""
    reader = spark.readStream.schema(RAW_WEATHER_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def stream_kafka_raw(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """S1 (streaming): Kafka-fed raw documents → parsed rows.

    Requires the spark-sql-kafka connector on the classpath; raises a clear
    error otherwise (the connector jar is not bundled in this environment).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), RAW_WEATHER_SCHEMA).alias("doc")
    ).select("doc.*")


def stream_rate_observations(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic observation stream from the built-in rate source (test
    double for the API feed, SURVEY §2.1 S1)."""
    cities = ["New York", "London", "Tokyo", "Sydney", "Berlin"]
    conditions = ["Clear", "Clouds", "Rain", "Drizzle", "Snow", "Mist"]
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    city = F.element_at(
        F.array(*[F.lit(c) for c in cities]), (F.col("value") % len(cities) + 1).cast("int")
    )
    cond = F.element_at(
        F.array(*[F.lit(c) for c in conditions]), (F.col("value") % len(conditions) + 1).cast("int")
    )
    return rate.select(
        F.col("timestamp"),
        city.alias("city"),
        cond.alias("weather_condition"),
        (F.pmod(F.hash("value"), F.lit(4000)) / 100.0 - 10.0).alias("temperature"),
        (F.pmod(F.hash("value", "timestamp"), F.lit(10000)) / 100.0).alias("humidity"),
    )
