"""as-of join semantics: backward lookup, at-timestamp inclusion, null
before first right row, per-key isolation."""

from __future__ import annotations

from skylogix_real_time_weather_data_pipeline_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", 5, "a"),   # after right@3 → 30
            ("u1", 3, "b"),   # exactly at right@3 → 30 (<= inclusive)
            ("u1", 2, "c"),   # after right@1 → 10
            ("u1", 0, "d"),   # before any right → null
            ("u2", 9, "e"),   # u2's own series → 99, never u1's
        ],
        "user string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 1, 10.0), ("u1", 3, 30.0), ("u2", 4, 99.0)],
        "user string, ts long, price double",
    )
    out = asof_join(left, right, on="ts", by="user")
    got = {r.tag: r.price_asof for r in out.collect()}
    assert got == {"a": 30.0, "b": 30.0, "c": 10.0, "d": None, "e": 99.0}
    assert out.count() == 5  # row-preserving on the left


def test_asof_join_carries_null_values_of_latest_row(spark):
    """A matched right row whose value column is legitimately NULL must be
    the row carried — not skipped in favor of an older non-null value."""
    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 2, "b")], "user string, ts long, tag string"
    )
    right = spark.createDataFrame(
        [("u1", 1, 10.0, "x"), ("u1", 4, None, "y")],
        "user string, ts long, price double, src string",
    )
    out = asof_join(left, right, on="ts", by="user")
    got = {r.tag: (r.price_asof, r.src_asof) for r in out.collect()}
    # tag a (ts=5): latest right row is ts=4 whose price is NULL — carry
    # (NULL, 'y'), NOT (10.0, 'y') or (10.0, 'x')
    assert got == {"a": (None, "y"), "b": (10.0, "x")}
