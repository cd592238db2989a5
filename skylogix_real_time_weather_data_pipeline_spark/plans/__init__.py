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
#: Round-7 window (the r1-r6 window history lives in git — this block at
#: earlier tags — and WINDOW_LEDGER.json). Tier 1 = the 8 queries whose
#: implementation or oracle changed this round: the two graph queries
#: (shared checkpointed co-trade frame, degree-descending triangle
#: orientation), the two sketch queries with degenerate-input guards
#: (bottom-k index clamp, KMV division guards — both mirrored into their
#: oracles), the distill oracle's integer-isqrt rewrite, and the three
#: queries whose lazily-referenced persist() moved to the owned-cache
#: registry (cache.py; results unchanged, execution path not). Tier 2 =
#: the certification drain (r6 verdict #1): ALL 11 rows last driver-green
#: in r2 plus the 31 highest-complexity rows last green in r3 —
#: oldest-first. The 9 r3 rows deferred to round 8 (named below) are the
#: simplest single-fact relational aggregates, unchanged since r3
#: (fingerprint-pinned) and hash-green under the typed local harness
#: every round since; the 33 r4 rows follow in round 8's drain.
_VERIFY_FIRST = (
    # --- tier 1: changed in round 7 ---
    "rel_pagerank",            # shared co-trade frame (plans/_shared.py)
    "rel_triangle_count",      # shared frame + degree-descending orientation
    "rel_bottomk_quantiles",   # n<k index clamp via sample-window count
    "rel_kmv_intersection",    # greatest(...,1) guards on empty-input DIVs
    "docs_distill_filter",     # oracle integer isqrt (Newton seed + clamps)
    "docs_temperature_mixture",  # counts cache → owned registry
    "docs_bigram_logprob",       # transition cache → owned registry
    "docs_ngram_jaccard_pairs",  # postings/sizes caches → owned registry
    # --- tier 2a: the whole r2-vintage tail (11 rows) ---
    "docs_bpe_token_count",
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_language_id",
    "docs_simhash",
    "rel_approx_distinct",
    "rel_distinct_parts",
    "weather_date_range",
    "weather_derived_projection",
    "weather_icon_lookup",
    "weather_outlier_counts",
    # --- tier 2b: r3-vintage drain, 31 of 40 (deferred to r8: the
    # simplest unchanged-since-r3 single-fact aggregates
    # rel_disjunctive_revenue, rel_large_orders, rel_lost_customers,
    # rel_product_profit, rel_promo_revenue, rel_returned_items,
    # rel_small_qty_revenue, rel_top_supplier, rel_volume_shipping) ---
    "docs_curation_pipeline",
    "docs_decontaminate",
    "docs_mixture_sample",
    "docs_quality_filter",
    "docs_quality_topk_per_source",
    "docs_repetition_stats",
    "docs_shard",
    "docs_split_assign",
    "docs_tfidf_topk",
    "docs_token_quantiles_by_lang",
    "emb_ivf_quantized_topk",
    "emb_ivf_topk",
    "emb_kmeans",
    "emb_semdedup",
    "events_funnel",
    "events_gap_fill",
    "events_retention",
    "events_top_transitions",
    "rel_fuzzy_part_names",
    "rel_late_shipment_priority",
    "rel_merge_upsert",
    "rel_order_count_distribution",
    "rel_salted_join",
    "rel_scd2_apply",
    "rel_waiting_suppliers",
    "rel_yearly_growth",
    "sql_priority_with_exists",
    "sql_recursive_chains",
    "weather_correlations",
    "weather_linear_fit",
    "weather_zscore_anomalies",
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
