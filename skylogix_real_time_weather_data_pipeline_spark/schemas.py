"""Explicit schemas for the weather data model (SURVEY.md §1.2).

The reference infers schemas from JSON/CSV on every read (reference
src/transform.py:148, src/analyze.py:88); we declare them once. Explicit
schemas are mandatory for streaming sources and eliminate the CSV
type-re-inference drift the reference risks (SURVEY §3.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Raw layer: the OpenWeatherMap-shaped nested document
# (reference src/transform.py:95-123 consumes exactly these fields, plus the
# enrichment metadata added at reference src/extract.py:124-127).
# ---------------------------------------------------------------------------

MAIN_STRUCT = StructType(
    [
        StructField("temp", DoubleType()),
        StructField("feels_like", DoubleType()),
        StructField("temp_min", DoubleType()),
        StructField("temp_max", DoubleType()),
        StructField("pressure", DoubleType()),
        StructField("humidity", DoubleType()),
    ]
)

WIND_STRUCT = StructType(
    [
        StructField("speed", DoubleType()),
        StructField("deg", DoubleType()),
    ]
)

WEATHER_ELEMENT = StructType(
    [
        StructField("main", StringType()),
        StructField("description", StringType()),
    ]
)

RAW_WEATHER_SCHEMA = StructType(
    [
        StructField("city_name", StringType()),
        StructField("country_code", StringType()),
        StructField("extraction_timestamp", StringType()),
        StructField("dt", LongType()),
        StructField("main", MAIN_STRUCT),
        StructField("wind", WIND_STRUCT),
        StructField("weather", ArrayType(WEATHER_ELEMENT)),
        # PERMISSIVE-mode corrupt-record capture replaces the reference's
        # per-file try/except (reference src/transform.py:70-75)
        StructField("_corrupt_record", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Silver layer: the canonical flat observation table
# (13 extracted + 4 derived columns; reference src/transform.py:126-140,198-203)
# ---------------------------------------------------------------------------

PROCESSED_WEATHER_SCHEMA = StructType(
    [
        StructField("city", StringType()),
        StructField("country", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("temperature", DoubleType()),
        StructField("feels_like", DoubleType()),
        StructField("temp_min", DoubleType()),
        StructField("temp_max", DoubleType()),
        StructField("pressure", DoubleType()),
        StructField("humidity", DoubleType()),
        StructField("wind_speed", DoubleType()),
        StructField("wind_direction", DoubleType()),
        StructField("weather_condition", StringType()),
        StructField("weather_description", StringType()),
        StructField("date", DateType()),
        StructField("hour", IntegerType()),
        StructField("day_of_week", StringType()),
        StructField("temp_range", DoubleType()),
    ]
)

#: numeric columns subject to IQR outlier cleaning
#: (reference src/transform.py:167-169)
NUMERIC_MEASURE_COLUMNS = [
    "temperature",
    "feels_like",
    "temp_min",
    "temp_max",
    "pressure",
    "humidity",
    "wind_speed",
    "wind_direction",
]

#: categorical columns null-filled with 'Unknown' (reference src/transform.py:194-195)
CATEGORICAL_FILL_COLUMNS = ["weather_condition", "weather_description"]
