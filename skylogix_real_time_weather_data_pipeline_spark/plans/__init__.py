"""Named query plans for the driver contract (__spark_entry__.py).

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet tables). Keys are disjoint across submodules; __spark_entry__ merges
them.
"""

from . import ext, relational, sql_surface, streaming_batch, weather  # noqa: F401

_MODULES = (weather, relational, ext, streaming_batch, sql_surface)

#: The driver's correctness harness checks the FIRST 50 queries() entries in
#: insertion order. Pinning policy (r2 ADVICE): any query whose
#: implementation OR oracle changed this round goes FIRST — rewritten
#: operators must not escape external verification — followed by queries the
#: driver has never checked; everything else follows in module order. The
#: full registry is additionally verified locally each round
#: (scripts/local_verify.py → CORRECTNESS_LOCAL_r{N}.json, committed).
#:
#: Round 3 has MORE changed/new queries than window slots. The decimal-
#: exact determinism sweep (functions/exact.py) touched ~45 oracles; most
#: are MECHANICAL (same math, the SUM/AVG fold wrapped in DECIMAL — the
#: rounded outputs are value-identical except at the flaky boundary cells
#: the sweep exists to pin). Window priority, highest risk first:
#:   tier 1 — queries whose oracle LOGIC changed this round (new estimator
#:     formula, or an exact fold now feeding a filter/rank gate);
#:   tier 2 — brand-new round-3 queries the driver has never checked.
#: Spilled below the boundary: mechanical decimal wraps and the lowest-risk
#: new queries (integer-exact or composition-of-verified pieces); every
#: spilled item is hash-green in the committed CORRECTNESS_LOCAL_r03.json,
#: which re-runs the ENTIRE registry at the driver's own sf0.01.
_VERIFY_FIRST = (
    # --- tier 1: oracle logic changed (formula/gate rewrites) ---
    "weather_linear_fit",              # CHANGED: exact-sum closed form (was covar/var/corr)
    "weather_zscore_anomalies",        # CHANGED: stddev from exact moments (gates the filter)
    "weather_temperature_trends",      # CHANGED: decimal daily mean + rounded-sum label compare
    "emb_centroids_by_label",          # CHANGED: decimal centroid means
    "emb_kmeans",                      # CHANGED: decimal per-iteration centroid means
    "emb_semdedup",                    # NEW + shares kmeans' changed centroid recurrence
    "emb_ivf_topk",                    # CHANGED: oracle centroid means now decimal-exact
    "emb_ivf_quantized_topk",          # NEW + same centroid change
    "sql_priority_with_exists",        # CHANGED: exact mean in the filter-gating subquery
    "rel_lost_customers",              # CHANGED: exact mean gates the balance filter
    "rel_supplier_value",              # CHANGED: exact sums feed the 4%-of-total gate
    "rel_top_supplier",                # CHANGED: exact sums feed the argmax gate
    "rel_small_qty_revenue",           # CHANGED: exact sum under the /7.0 output
    "rel_market_share",                # CHANGED: exact-sum ratio (num and denom)
    "rel_promo_revenue",               # CHANGED: exact-sum ratio (num and denom)
    "rel_rolling_revenue",             # CHANGED: decimal end-to-end through the RANGE window
    "rel_running_order_total",         # CHANGED: decimal ROWS-window running sum
    # --- tier 2: brand-new round-3 queries, never driver-verified ---
    "rel_large_orders",                # NEW query + oracle
    "rel_waiting_suppliers",           # NEW query + oracle
    "docs_tfidf_topk",                 # NEW query + oracle
    "docs_quality_filter",             # NEW query + oracle
    "events_top_transitions",          # NEW query + oracle
    "events_props_variant",            # NEW query + oracle
    "rel_scd2_apply",                  # NEW query + oracle
    "docs_split_assign",               # NEW query + oracle
    "docs_curation_pipeline",          # NEW query + oracle
    "rel_product_profit",              # NEW query + oracle (decimal profit sum)
    "rel_volume_shipping",             # NEW query + oracle
    "rel_order_count_distribution",    # NEW query + oracle
    "rel_returned_items",              # NEW query + oracle
    "rel_late_shipment_priority",      # NEW query + oracle
    "rel_yearly_growth",               # NEW query + oracle
    "docs_decontaminate",              # NEW query + oracle
    "events_funnel",                   # NEW query + oracle
    "events_retention",                # NEW query + oracle
    "events_props_stats",              # NEW query + oracle
    "rel_fuzzy_part_names",            # NEW query + oracle
    "docs_shard",                      # NEW query + oracle
    "events_gap_fill",                 # NEW query + oracle
    "weather_correlations",            # NEW query + oracle
    "sql_recursive_chains",            # NEW query + oracle
    "rel_disjunctive_revenue",         # NEW query + oracle
    "docs_simhash_near_pairs",         # NEW query + oracle
    "rel_salted_join",                 # NEW query + oracle
    "rel_merge_upsert",                # NEW query + oracle
    "docs_quality_topk_per_source",    # NEW query + oracle
    "docs_mixture_sample",             # NEW query + oracle
    "docs_token_quantiles_by_lang",    # NEW query + oracle
    "docs_repetition_stats",           # NEW query + oracle
    "stream_window_topk",              # NEW query + oracle
    # --- window boundary (driver checks 50): below here everything is
    # --- locally hash-verified at sf0.01; spill rationale above ---
    # new but lowest-risk (integer-exact / composition of verified pieces):
    "weather_temperature_buckets",     # NEW (CASE bucket counts — integer-exact)
    "docs_pack",                       # NEW + recursive-CTE oracle (integer greedy packing)
    "rel_order_percentiles",           # NEW (deterministic percentile interpolation)
    "rel_grouping_sets",               # NEW (integer quantity sums)
    "rel_unpivot_city_metrics",        # NEW (mechanical melt of converted city_comparison)
    "docs_dedup_decisions",            # NEW (decision table over verified docs_dedup_clusters)
    "emb_quantize_int8",               # NEW (integer-exact)
    "emb_quantized_topk",              # NEW (integer-exact)
    "emb_pairwise_topk",               # NEW oracle (was rows-only; r02-seen)
    # mechanical decimal wraps (same math, exact fold; local-verified):
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_top_customers_per_nation",
    "rel_segment_monthly",
    "rel_shipping_priority",
    "rel_cube_lineitem",
    "weather_basic_stats",
    "weather_city_comparison",
    "weather_warmest_coldest",
    "weather_daily_city_agg",
    "weather_daily_pivot",
    "weather_humidity_decile_agg",
    "sql_forecast_revenue",
    "stream_tumbling_daily",
    "stream_sliding_6h",
    "stream_sessionize",
    "stream_range_join_windows",
    # earlier round-3 rewrites, r02-or-local green:
    "emb_lsh_near_dup_pairs",          # rewrite: single-eval candidates; oracle threshold
    "weather_quantile_summary",        # rewrite: single-scan percentile arrays
    "docs_minhash_lsh_pairs",          # oracle: bucket cap mirrored
    "docs_ngram_jaccard_pairs",        # oracle: shingle-df cap mirrored
    "docs_dedup_clusters",             # oracle: bucket cap mirrored
    "docs_pii_scrub",                  # phone pattern tightened
    # green in r01 but absent from CORRECTNESS_r02 (VERDICT item 8):
    "stream_asof_last_purchase",
    "docs_normalize",
    "docs_chunk",
    "emb_cosine_topk",
    "emb_lsh_buckets",
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
