"""Named query plans for the driver contract (__spark_entry__.py).

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet tables). Keys are disjoint across submodules; __spark_entry__ merges
them.
"""

from . import ext, relational, sketches, sql_surface, streaming_batch, weather  # noqa: F401

_MODULES = (weather, relational, ext, streaming_batch, sql_surface, sketches)

#: The driver's correctness harness checks the FIRST 50 queries() entries in
#: insertion order. Pinning policy (r2 ADVICE): any query whose
#: implementation OR oracle changed this round goes FIRST — rewritten
#: operators must not escape external verification — followed by queries the
#: driver has never checked post-latest-change; everything else follows in
#: module order. The full registry is additionally verified locally each
#: round (scripts/local_verify.py → CORRECTNESS_LOCAL_r{N}.json, committed).
#:
#: Round-6 window. Tier 1 = changed this round: the events_cumulative_users
#: oracle BIGINT cast (the r5 red row — never driver-green, slot 1), the
#: pagerank long-node-id rewrite, the winnowing Carter-Wegman k-gram hash
#: rewrite (stats + pairs), the temperature-buckets oracle DOUBLE edge
#: casts, the chi-square double-promoted expected counts, and the
#: persist()-lifecycle changes (distill/temperature_mixture/bigram). Tier
#: 1b = the _units_long floor-form unit extraction + one-call F.expr
#: aggregates (functions/exact.py, r6): every fsum1/fmean1/fmean1_round/
#: fwsum consumer changed its execution path; 16 of the 17 consumers are
#: in-window, covering each helper and both fmean1_round branches (k>=s:
#: basic_stats; k<s: city_comparison wind). ONE covered-path spill:
#: weather_humidity_decile_agg — its fmean1_round("temperature", 2, 6)
#: call is byte-identical to the in-window daily_city_agg/seasonal rows,
#: and it is hash-green in CORRECTNESS_LOCAL_r06.json. Also transitively
#: covered: rel_unpivot_city_metrics (melts the in-window
#: city_comparison aggregate; hash-green locally). Tier 0 = the six NEW
#: sketch queries (plans/sketches.py) — never driver-checked, so they
#: outrank everything. Tier 2 = 15 of the 25 rows last driver-green in r2
#: (verdict #5: drain the stale tail); the ten displaced to make room
#: for tier 0 are the lowest-risk rows (named at tier 0 below), unchanged
#: since r2 and green under the typed r6 local harness. The r1-r5 window history lives in git (this block at
#: tags r5 and earlier) and WINDOW_LEDGER.json.
_VERIFY_FIRST = (
    # --- tier 0: NEW in round 6 (never driver-checked) — the sketch
    # family (plans/sketches.py): KMV distinct + set algebra, HyperLogLog,
    # count-min heavy hitters, Bloom semi-join, triangle count. To fit
    # them, six of the LOWEST-RISK tier-2 rows (unchanged since r2, green
    # under the r6 TYPED local harness) yield their slots:
    # weather_date_range, weather_icon_lookup, weather_derived_projection,
    # rel_distinct_parts, rel_approx_distinct (its driver check is
    # rows+schema only — the weakest slot in the window — and the new
    # fully-oracled KMV/HLL rows cover the same operator family far more
    # strictly), docs_exact_dedup (5-line md5 groupBy, unchanged since
    # r2, typed-green locally), docs_fingerprint (winnowing-lite map;
    # the full winnowing pair sits in tier 1 this round),
    # docs_language_id (stopword-ratio projection, typed-green locally),
    # docs_bpe_token_count (regex token count), docs_simhash (signature
    # map whose heavy pair consumer was driver-green in r5 and is
    # benched). Risk logic: a never-externally-checked NEW query always
    # outranks an unchanged-since-r2 row that the now-driver-equivalent
    # typed local harness re-greens every round.
    "rel_kmv_distinct",
    "rel_cms_heavy_hitters",
    "rel_bloom_semijoin",
    "rel_triangle_count",
    "rel_hll_distinct",
    "rel_kmv_intersection",
    "rel_priority_sample_revenue",
    "rel_ams_f2",
    "rel_hll_monthly_customers",
    "rel_hll_rolling_distinct",
    # late-r6 addition (never driver-checked; outranks tier 2 per the
    # risk logic above — weather_outlier_counts yields its slot: unchanged
    # since r2, typed-green in CORRECTNESS_LOCAL_r06):
    "rel_bottomk_quantiles",
    # --- tier 1: changed in round 6 ---
    "events_cumulative_users",         # oracle window SUM cast to BIGINT (r5 red row)
    "rel_pagerank",                    # long node ids, complete-in-degree iterations
    "docs_winnowing",                  # Carter-Wegman token-hash k-gram combine
    "docs_winnowing_pairs",            # same selection core, struct h field
    "weather_temperature_buckets",     # oracle bucket edges cast to DOUBLE
    "docs_lang_source_chisq",          # expected-count product promoted to double
    "docs_distill_filter",             # training caches unpersist after distillation
    "docs_temperature_mixture",        # counts-cache lifecycle documented/scoped
    "docs_bigram_logprob",             # transition-cache lifecycle
    # --- tier 1b: floor-form unit extraction + one-call F.expr aggregates
    # (every fsum1/fmean1/fmean1_round/fwsum consumer; 16/17 in-window) ---
    "weather_basic_stats",
    "weather_city_comparison",
    "weather_daily_city_agg",
    "weather_temperature_trends",
    "weather_daily_pivot",
    "weather_warmest_coldest",
    "weather_seasonal_anomaly",
    "stream_tumbling_daily",
    "stream_sliding_6h",
    "stream_sessionize",
    "stream_window_topk",
    "stream_range_join_windows",
    "rel_running_order_total",
    "rel_rolling_revenue",
    "events_props_stats",
    "events_props_variant",
    # --- tier 2: drain of the r2-vintage stale tail (verdict #5) ---
    "docs_minhash_signatures",
    "docs_token_stats",
    "docs_top_ngrams",
    "rel_customers_without_orders",
    "rel_latest_order_per_customer",
    "rel_parts_shipped",
    "rel_rollup_lineitem",
    "rel_set_ops",
    "stream_dedup_keyed",
    "weather_city_quantiles",
    "weather_clean_outliers",
    "weather_condition_histogram",
    "weather_condition_mode_by_city",
    "weather_exact_median",
)


def _merged(attr):
    out = {}
    for mod in _MODULES:
        out.update(getattr(mod, attr))
    first = {k: out[k] for k in _VERIFY_FIRST if k in out}
    first.update(out)
    return first


def all_queries():
    return _merged("QUERIES")


def all_oracles():
    return _merged("ORACLES")
