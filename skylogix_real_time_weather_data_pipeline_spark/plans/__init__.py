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
#: Round-13 window (earlier windows live in git history and
#: WINDOW_LEDGER.json). Tier 1 = the ten NEW rows (the URL family
#: incl. the retractable canonical-URL view, the scaled-k SemDeDup, the
#: HLL bounds row, the CDC router's fourth family and its as-of
#: third family), the seven rows whose query or oracle changed this round
#: (the three multimodal rows graduating from rows-only to planted-truth
#: value oracles; the three fsum conversions; emb_semdedup's oracle
#: recomposed through the k-parameterized _km_ctes builder), the kmeans
#: pair sharing that rebuilt CTE chain, and the entire
#: retract/changelog/as-of family — their shared segment machinery moved
#: this round (manifest row counts, empty-tombstone trigger exclusion,
#: the residue-preserving daily-counts compaction fold), so the driver
#: hash must re-certify every row that touches it. Tier 2 = the 15
#: rows whose last driver green is r8 (the oldest vintage; the r12 note
#: promised they lead the r13 queue), then the 5 oldest r9-vintage rows
#: by change round. 32 + 15 + 3 = 50 (weather_warmest_coldest,
#: docs_bigram_logprob and docs_remove_dup_chunks, next in the r9
#: queue, yield their slots to the late tier-1 rows and lead the r14
#: refresh queue with the remaining r9 tail).
_VERIFY_FIRST = (
    # --- tier 1a: new in round 13 ---
    "docs_url_canonical",            # NEW: URL canonicalizer under value hash
    "docs_url_dedup",                # NEW: canonical-URL dedup
    "docs_domain_mix",               # NEW: registrable-domain composition
    "docs_url_decontaminate",        # NEW: URL-level decontamination
    "docs_bm25_topk_changelog",      # NEW: CDC router, term-stats family
    "docs_bm25_topk_asof",           # NEW: as-of snapshot, third family
    "docs_url_dedup_retract",        # NEW: Z-set keyed on canonical URLs
    "docs_url_blocklist",            # NEW: domain-blocklist audit gate
    "emb_semdedup_scaledk",          # NEW: sqrt(n)-k SemDeDup (scale posture)
    "rel_approx_distinct_bounds",    # NEW: HLL vs exact COUNT(DISTINCT) envelope
    # --- tier 1b: query or oracle changed in round 13 ---
    "mm_phash_near_dup",             # rows-only -> planted-truth value oracle
    "mm_audio_near_dup",
    "mm_video_near_dup",
    "weather_linear_fit",            # decimal -> fsum fast path + sql twins
    "weather_zscore_anomalies",
    "rel_product_profit",
    "emb_semdedup",                  # oracle via _km_ctes builder
    "emb_kmeans",                    # shared rebuilt CTE chain
    "emb_kmeans_arrow",
    # --- tier 1c: segment-machinery family (matview.py moved this round) ---
    "events_daily_retract",          # + residue-preserving compaction fold
    "events_daily_changelog",
    "docs_exact_dedup_retract",
    "docs_exact_dedup_changelog",
    "docs_exact_dedup_asof",
    "docs_substring_rewrite_retract",
    "docs_substring_rewrite_asof",
    "docs_substring_rewrite_segmented",
    "docs_minhash_pairs_retract",
    "docs_minhash_pairs_changelog",
    "docs_bm25_topk_retract",
    "emb_ivf_topk_retract",
    "rel_count_sketch_retract",
    # --- tier 2a: the 15 rows last driver-green in r8 (oldest vintage) ---
    "rel_promo_revenue",
    "rel_returned_items",
    "rel_revenue_by_nation",
    "rel_segment_monthly",
    "rel_shipping_priority",
    "rel_small_qty_revenue",
    "rel_supplier_part_counts",
    "rel_top_customers_per_nation",
    "rel_top_supplier",
    "rel_unpivot_city_metrics",
    "rel_volume_shipping",
    "sql_forecast_revenue",
    "stream_asof_last_purchase",
    "stream_hopping_distinct",
    "weather_quantile_summary",
    # --- tier 2b: the 3 oldest r9-vintage rows by change round ---
    "weather_city_quantiles",
    "weather_correlations",
    "weather_temperature_buckets",
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
