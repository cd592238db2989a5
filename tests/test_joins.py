"""Join-strategy helper tests: salted join equivalence, broadcast dim join,
bucketed tables eliminating the exchange."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from skylogix_real_time_weather_data_pipeline_spark.operators.joins import (
    broadcast_dim_join,
    salted_join,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark):
    # heavy skew: 90% of rows share key 0
    big = spark.createDataFrame(
        [(0 if i % 10 else i % 3, f"v{i}") for i in range(1000)], "k int, payload string"
    )
    small = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two")], "k int, name string")
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt_factor=4).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_broadcast_dim_join_uses_broadcast(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = broadcast_dim_join(c, n, on=c.c_nationkey == n.n_nationkey)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == c.count()


def test_bucketed_join_skips_exchange(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_test")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        write_bucketed(o, "bucket_test.orders_b", "o_custkey", n_buckets=8)
        write_bucketed(
            c.withColumnRenamed("c_custkey", "o_custkey"), "bucket_test.customer_b",
            "o_custkey", n_buckets=8,
        )
        ob = spark.table("bucket_test.orders_b")
        cb = spark.table("bucket_test.customer_b")
        joined = ob.join(cb, "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with NO shuffle exchange
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS bucket_test CASCADE")
