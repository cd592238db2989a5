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


def test_scd2_apply_close_insert_noop_newkey(spark):
    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [
            # current rows
            (1, "alice", "GOLD", "2020-01-01", None),
            (2, "bob", "SILVER", "2020-01-01", None),
            (3, "carol", "BRONZE", "2021-05-01", None),
            # pre-existing history row must pass through untouched
            (3, "carol", "SILVER", "2020-01-01", "2021-05-01"),
        ],
        "k long, name string, tier string, valid_from string, valid_to string",
    ).select(
        "k", "name", "tier",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [
            (1, "alice", "PLATINUM"),   # attr change → close + open
            (2, "bob", "SILVER"),       # identical → no-op
            (9, "dave", "GOLD"),        # new key → insert
        ],
        "k long, name string, tier string",
    )
    out = scd2_apply(dim, changes, ["k"], ["name", "tier"], "2022-07-01")
    rows = sorted(
        ((r.k, r.tier, str(r.valid_from), str(r.valid_to)) for r in out.collect())
    )
    assert rows == sorted([
        (1, "GOLD", "2020-01-01", "2022-07-01"),      # closed
        (1, "PLATINUM", "2022-07-01", "None"),        # opened
        (2, "SILVER", "2020-01-01", "None"),          # no-op survives
        (3, "BRONZE", "2021-05-01", "None"),          # untouched current
        (3, "SILVER", "2020-01-01", "2021-05-01"),    # history passthrough
        (9, "GOLD", "2022-07-01", "None"),            # brand-new key
    ])


def test_scd2_apply_is_idempotent(spark):
    """Re-applying the same change batch must not create new versions."""
    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "x", "A", "2020-01-01", None)],
        "k long, name string, tier string, valid_from string, valid_to string",
    ).select(
        "k", "name", "tier",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
    )
    changes = spark.createDataFrame([(1, "x", "B")], "k long, name string, tier string")
    once = scd2_apply(dim, changes, ["k"], ["name", "tier"], "2022-07-01")
    twice = scd2_apply(once, changes, ["k"], ["name", "tier"], "2022-07-01")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
