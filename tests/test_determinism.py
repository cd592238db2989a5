"""Fold-order independence of the rounded aggregates (functions/exact.py).

IEEE double addition is not associative, so any ``ROUND(SUM(double))`` whose
fold order varies with partitioning can flip its last rounded digit between
runs — exactly the class of flake the decimal-exact sweep removes. These
tests re-run converted queries under deliberately different partition
layouts (which permute Spark's partial-aggregation fold order) and assert
the outputs are BIT-IDENTICAL, not merely approximately equal.

A plain ``AVG(double)`` control is NOT asserted unstable (its instability
is probabilistic); the converted queries are asserted stable, which decimal
arithmetic guarantees structurally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as ENTRY

#: converted queries spanning every changed module: Q1 wide agg, joined agg,
#: windowed decimal sums, gated means, exact-moment statistics, centroid
#: means, streaming-shaped window sums.
_STABILITY_QUERIES = [
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_running_order_total",
    "rel_rolling_revenue",
    "rel_market_share",
    "weather_temperature_trends",
    "weather_linear_fit",
    "weather_zscore_anomalies",
    "weather_daily_city_agg",
    "stream_tumbling_daily",
    "emb_centroids_by_label",
    "sql_priority_with_exists",
    # round-4 additions: new folds and rate-derivation paths
    "docs_unigram_logprob",
    "docs_temperature_mixture",
    "weather_seasonal_anomaly",
    "rel_customer_ntile_segments",
    # round-5 retrieval stack: quantized fsum fold, fixed-point fusion,
    # integer-unit greedy over a TakeOrdered shortlist
    "docs_bm25_topk",
    "docs_hybrid_rrf",
    "emb_mmr_rerank",
    "docs_zipf_fit",
    "events_anomaly_mad",
]


def _exact_rows(df):
    # repr() preserves the full double — no 9-sig-fig forgiveness here;
    # the whole point is bit-identical output across layouts
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", _STABILITY_QUERIES)
def test_rounded_aggregates_are_layout_independent(spark, sf_dir, name):
    q = ENTRY.queries()[name]
    baseline = _exact_rows(q(spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # different reducer count → different partial-agg merge tree
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert _exact_rows(q(spark, sf_dir)) == baseline
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        assert _exact_rows(q(spark, sf_dir)) == baseline
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_decimal_sum_is_order_independent_directly(spark):
    """Micro-proof on the helper itself: a sum engineered to be fold-order
    sensitive in double (catastrophic mix of magnitudes) is stable through
    dsumx under shuffled row orders and partition counts."""
    from skylogix_real_time_weather_data_pipeline_spark.functions.exact import dsumx

    vals = [(1e9, ), (3.14159, )] * 50 + [(-1e9, )] * 50
    df = spark.createDataFrame(vals, ["x"])
    outs = set()
    for parts in (1, 3, 13):
        out = (
            df.repartition(parts, F.rand(seed=parts))
            .agg(F.round(dsumx("x"), 2).alias("s"))
            .collect()[0]["s"]
        )
        outs.add(repr(out))
    assert len(outs) == 1, outs
