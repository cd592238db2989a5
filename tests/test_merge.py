"""MERGE upsert semantics (operators/merge.py): update, insert, carry-over,
delete, schema guard, and the parquet in-place path."""

from __future__ import annotations

import pytest

from skylogix_real_time_weather_data_pipeline_spark.operators.merge import (
    merge_into_parquet,
    merge_upsert,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )


def test_merge_update_insert_carry_over(spark):
    source = spark.createDataFrame(
        [(2, "b2", 22.0), (9, "new", 90.0)], "k long, name string, v double"
    )
    got = sorted(map(tuple, merge_upsert(_target(spark), source, ["k"]).collect()))
    assert got == [(1, "a", 10.0), (2, "b2", 22.0), (3, "c", 30.0), (9, "new", 90.0)]


def test_merge_with_deletes(spark):
    source = spark.createDataFrame([(9, "new", 90.0)], "k long, name string, v double")
    deletes = spark.createDataFrame([(1,)], "k long")
    got = sorted(map(tuple, merge_upsert(_target(spark), source, ["k"], deletes).collect()))
    assert got == [(2, "b", 20.0), (3, "c", 30.0), (9, "new", 90.0)]


def test_merge_rejects_mismatched_columns(spark):
    source = spark.createDataFrame([(1, "x")], "k long, name string")
    with pytest.raises(ValueError, match="column sets differ"):
        merge_upsert(_target(spark), source, ["k"])


def test_merge_into_parquet_round_trip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _target(spark).write.parquet(path)
    source = spark.createDataFrame(
        [(3, "c3", 33.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    merge_into_parquet(spark, path, source, ["k"])
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (3, "c3", 33.0), (4, "d", 40.0)]
