"""SQL-surface queries: the same engine driven through ``spark.sql``.

The reference has no SQL entry point; this engine exposes Spark SQL as a
first-class API (SURVEY §3.4 — the lifecycle is Catalyst's regardless of
whether the plan arrives via DataFrame calls or SQL text). These queries
register the testdata as temp views and run ANSI SQL with scalar/EXISTS
subqueries — plans land in the exact same optimizer as the DataFrame forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (idempotent)."""
    from ..sources import load_table

    for t in _TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def q_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + aggregate — the pushdown showcase
    (every predicate reaches the parquet scan; no shuffle at all beyond the
    final partial/final agg)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """)


O_SQL_FORECAST_REVENUE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
"""


def q_sql_priority_with_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery (rewritten to a semi join by Catalyst)
    + scalar aggregate comparison subquery."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
    """)


O_SQL_PRIORITY_EXISTS = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
  AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""


QUERIES = {
    "sql_forecast_revenue": q_sql_forecast_revenue,
    "sql_priority_with_exists": q_sql_priority_with_exists,
}

ORACLES = {
    "sql_forecast_revenue": O_SQL_FORECAST_REVENUE,
    "sql_priority_with_exists": O_SQL_PRIORITY_EXISTS,
}
