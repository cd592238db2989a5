"""SQL-surface queries: the same engine driven through ``spark.sql``.

The reference has no SQL entry point; this engine exposes Spark SQL as a
first-class API (SURVEY §3.4 — the lifecycle is Catalyst's regardless of
whether the plan arrives via DataFrame calls or SQL text). These queries
register the testdata as temp views and run ANSI SQL with scalar/EXISTS
subqueries — plans land in the exact same optimizer as the DataFrame forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.exact import sql_fsum

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
    return spark.sql(f"""
        SELECT ROUND({sql_fsum('l_extendedprice * l_discount')}, 2) AS revenue_delta,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """)


O_SQL_FORECAST_REVENUE = f"""
SELECT ROUND({sql_fsum('l_extendedprice * l_discount')}, 2) AS revenue_delta,
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
          AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
    """)


O_SQL_PRIORITY_EXISTS = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
  AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""


def q_sql_recursive_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 SQL surface): group each sampled customer's
    orders into chains of consecutive orders ≤ 7 days apart, walking the
    lag-derived successor edges recursively. The recursion is linear
    (strictly increasing order keys, no cycles), so UNION ALL terminates;
    depth = longest chain. Returns (custkey, chain_start, chain_len)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE o AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 lag(o_orderdate) OVER w AS prev_dt,
                 lag(o_orderkey)  OVER w AS prev_key
          FROM orders WHERE o_custkey % 50 = 0
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        chain(custkey, okey, root) AS (
          SELECT o_custkey, o_orderkey, o_orderkey FROM o
          WHERE prev_dt IS NULL OR datediff(o_orderdate, prev_dt) > 7
          UNION ALL
          SELECT o.o_custkey, o.o_orderkey, c.root
          FROM chain c JOIN o ON o.o_custkey = c.custkey AND o.prev_key = c.okey
          WHERE o.prev_dt IS NOT NULL AND datediff(o.o_orderdate, o.prev_dt) <= 7
        )
        SELECT custkey, root AS chain_start, CAST(COUNT(*) AS BIGINT) AS chain_len
        FROM chain GROUP BY custkey, root
    """)


O_SQL_RECURSIVE_CHAINS = """
WITH RECURSIVE o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lag(o_orderdate) OVER w AS prev_dt,
         lag(o_orderkey)  OVER w AS prev_key
  FROM orders WHERE o_custkey % 50 = 0
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
chain(custkey, okey, root) AS (
  SELECT o_custkey, o_orderkey, o_orderkey FROM o
  WHERE prev_dt IS NULL OR date_diff('day', prev_dt, o_orderdate) > 7
  UNION ALL
  SELECT o.o_custkey, o.o_orderkey, c.root
  FROM chain c JOIN o ON o.o_custkey = c.custkey AND o.prev_key = c.okey
  WHERE o.prev_dt IS NOT NULL AND date_diff('day', o.prev_dt, o.o_orderdate) <= 7
)
SELECT custkey, root AS chain_start, CAST(COUNT(*) AS BIGINT) AS chain_len
FROM chain GROUP BY custkey, root
"""


QUERIES = {
    "sql_forecast_revenue": q_sql_forecast_revenue,
    "sql_priority_with_exists": q_sql_priority_with_exists,
    "sql_recursive_chains": q_sql_recursive_chains,
}

ORACLES = {
    "sql_forecast_revenue": O_SQL_FORECAST_REVENUE,
    "sql_priority_with_exists": O_SQL_PRIORITY_EXISTS,
    "sql_recursive_chains": O_SQL_RECURSIVE_CHAINS,
}
