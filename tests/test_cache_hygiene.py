"""Owned-cache hygiene (cache.py): every persist() the package creates is
registered and releasable, so long-lived sessions never accumulate
CacheManager entries query after query."""

from __future__ import annotations

import os
import re

from skylogix_real_time_weather_data_pipeline_spark.cache import (
    owned_cache_count,
    release_owned_caches,
)

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "skylogix_real_time_weather_data_pipeline_spark",
)


def test_no_raw_persist_outside_cache_module():
    """Static sweep: `.persist(` may appear only in cache.py (the owned
    registry) — a raw persist elsewhere is an unreleasable leak."""
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            if os.path.basename(path) == "cache.py":
                continue
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    code = line.split("#", 1)[0]
                    if re.search(r"\.persist\(", code):
                        offenders.append(f"{path}:{i}")
    assert not offenders, offenders


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_release_empties_cache_manager(spark, sf_dir):
    """Run every cache-creating operator family, materialize results, then
    release: the registry must drain and Spark's CacheManager must be
    EMPTY — the round-6 review's leak (mixture counts, bigram transition
    table, jaccard postings, shuffle range table, distill features) is
    exactly entries surviving here."""
    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.ext.dedup import (
        ngram_jaccard_pairs,
    )
    from skylogix_real_time_weather_data_pipeline_spark.ext.text import (
        bigram_logprob,
        distill_quality_classifier,
        temperature_mixture,
    )
    from skylogix_real_time_weather_data_pipeline_spark.operators.shuffle import (
        global_rank,
    )

    release_owned_caches(spark)  # start clean regardless of test order
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)

    temperature_mixture(docs.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    ), lang_col="lang").collect()
    bigram_logprob(docs).collect()
    ngram_jaccard_pairs(docs).collect()
    global_rank(docs.select("doc_id"), "doc_id").collect()
    distill_quality_classifier(docs, n_iter=2).collect()

    assert owned_cache_count(spark) > 0  # the operators did register caches
    released = release_owned_caches(spark)
    assert released >= 5
    assert owned_cache_count(spark) == 0
    assert _cache_manager_empty(spark), "CacheManager entries survived release"


def test_dead_session_entries_evicted(spark, sf_dir):
    """Registry/memoization dicts keyed by applicationId must not grow
    across session cycles: only one SparkContext is live per process, so
    entries under any other app id are unreleasable garbage (r7 advisor)."""
    from skylogix_real_time_weather_data_pipeline_spark import cache
    from skylogix_real_time_weather_data_pipeline_spark.plans import _shared
    from skylogix_real_time_weather_data_pipeline_spark.sources import batch
    from skylogix_real_time_weather_data_pipeline_spark.sources.batch import (
        load_table,
    )

    cache._OWNED["dead-app"] = []
    _shared._CO_TRADE_CACHE[("dead-app", "/x")] = None
    batch._TABLE_CACHE[("dead-app", "/x", "orders")] = None

    df = load_table(spark, sf_dir, "orders")
    assert ("dead-app", "/x", "orders") not in batch._TABLE_CACHE
    cache.owned_persist(df.limit(1))
    assert "dead-app" not in cache._OWNED
    _shared.co_trade_pair_counts(spark, sf_dir)
    assert ("dead-app", "/x") not in _shared._CO_TRADE_CACHE
    cache.release_owned_caches(spark)
