"""Weighted PageRank (operators/graph.py): integer-unit recurrence
properties — mass conservation, hub concentration, layout independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from skylogix_real_time_weather_data_pipeline_spark.operators.graph import U, pagerank


def _star_edges(spark, n_leaves=8):
    """Symmetric star: hub h ↔ leaves l1..ln, unit weights."""
    rows = []
    for i in range(1, n_leaves + 1):
        rows.append(("h", f"l{i}", 1))
        rows.append((f"l{i}", "h", 1))
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def test_star_hub_dominates_and_mass_conserved(spark):
    out = {r.node: r.rank for r in pagerank(_star_edges(spark), n_iter=2).collect()}
    assert len(out) == 9
    # all mass flows through the hub: hub rank far above any leaf
    hub, leaves = out["h"], [v for k, v in out.items() if k != "h"]
    assert hub > max(leaves) * 2
    # leaves are symmetric → identical ranks
    assert len(set(leaves)) == 1
    # total mass stays ~1 (floor quantization only loses <1 unit per node)
    assert abs(sum(out.values()) - 1.0) < 1e-5


def test_weighted_edges_shift_rank(spark):
    """A destination receiving 9/10 of its source's weight outranks the
    destination receiving 1/10 (triangle a→{b,c} weighted 9:1, with back
    edges so nothing dangles)."""
    rows = [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    df = spark.createDataFrame(rows, "src string, dst string, weight long")
    out = {r.node: r.rank for r in pagerank(df, n_iter=2).collect()}
    assert out["b"] > out["c"]


def test_pagerank_copartition_values_bit_identical(spark):
    """copartition=True changes layout (cached hash-partitioned share,
    per-iteration rank checkpoints) but not one bit of the arithmetic:
    the contribution fold is an order-independent long sum."""
    import pyspark.sql.functions as F

    n = 300
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 1) % n).alias("dst"),
        (F.col("id") % 5 + 1).alias("weight"))
    # the multiplicative map is not a permutation guaranteed to cover all
    # in-degrees, so run WITHOUT complete_in_degree (re-attach path on)
    a = sorted(map(tuple, pagerank(edges, n_iter=3).collect()))
    b = sorted(map(tuple, pagerank(edges, n_iter=3,
                                   copartition=True).collect()))
    assert a == b


def test_pagerank_layout_independent(spark):
    """Integer folds are associative: identical ranks at 1 and 32
    partitions."""
    edges = _star_edges(spark, 6)
    a = sorted(map(tuple, pagerank(edges.coalesce(1), n_iter=2).collect()))
    b = sorted(map(tuple, pagerank(edges.repartition(32), n_iter=2).collect()))
    assert a == b


def test_rank_units_are_exact_integers(spark):
    """The returned rank must be an exact multiple of 1/U — the integer
    recurrence never leaves the grid."""
    out = pagerank(_star_edges(spark), n_iter=2).collect()
    for r in out:
        assert abs(r.rank * U - round(r.rank * U)) < 1e-4
