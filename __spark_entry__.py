"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.2 — the reference's
core analytical question, A2+A4 city comparison) at sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the extension surface, with DuckDB oracles for everything
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust under file-path import (importlib from another CWD)
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from skylogix_real_time_weather_data_pipeline_spark import plans
from skylogix_real_time_weather_data_pipeline_spark.plans import weather

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-city multi-metric comparison + warmest/coldest
    ranking (SURVEY §7.2; reference src/analyze.py:185-218) on sf0.001."""
    from pyspark.sql import functions as F

    comparison = weather.q_city_comparison(spark, SF_SMOKE)
    return comparison.orderBy(F.desc("temp_mean"), F.asc("city"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omissions are the
    documented rows-only checks: two-phase driver-side ops)."""
    return plans.all_oracles()
