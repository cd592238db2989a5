"""Shared, memoized intermediate frames used by more than one registry
query.

The first consumer pays the build + localCheckpoint materialization; every
later consumer in the same session reuses the checkpointed rows — exactly
how a production deployment would persist the frame in a summary table
rather than re-deriving it per downstream query. Keyed by (applicationId,
sf_dir) like sources/batch.py's load_table plan cache, so a fresh
SparkSession never sees another session's (possibly GC'd) checkpoints.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (applicationId, sf_dir) → checkpointed co-trade pair-count frame
_CO_TRADE_CACHE: dict[tuple[str, str], DataFrame] = {}


def co_trade_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (o_custkey, l_suppkey, w) trade-pair frame: one row per
    customer↔supplier pair that traded, w = number of lineitems between
    them. This is the single fact-table join both graph queries branch
    from — `rel_pagerank` consumes it as the weighted bipartite edge
    list, `rel_triangle_count` as the distinct pair table (the groupBy
    keys ARE the distinct pairs) for its co-supplier self-join — so it is
    built and localCheckpointed ONCE per session and shared; without the
    memo each query re-ran the lineitem⋈orders join + groupBy from the
    parquet scan (measured: the doubled fact join dominated whichever
    query ran second).
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    # one active SparkContext per process: entries under any OTHER app id
    # belong to a stopped session — evict them so a session-cycling
    # process doesn't pin dead checkpointed frames forever (r7 advisor)
    for dead in [k for k in _CO_TRADE_CACHE if k[0] != key[0]]:
        del _CO_TRADE_CACHE[dead]
    cached = _CO_TRADE_CACHE.get(key)
    if cached is not None:
        return cached
    from ..sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    _CO_TRADE_CACHE[key] = cs
    return cs
