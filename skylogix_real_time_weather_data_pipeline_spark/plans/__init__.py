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
#: Round-12 window (earlier windows live in git history and
#: WINDOW_LEDGER.json). Tier 1 = the two NEW rows
#: (docs_minhash_pairs_changelog — the CDC router certified against the
#: capped collect_set view family; mm_audio_near_dup — the second
#: multimodal modality, rows-only) and every row whose deep
#: implementation moved this round: rel_count_sketch_retract (the
#: estimator's probe/counter columns were renamed collision-proof), the
#: whole retraction family (their retract appliers now fire the r12
#: TOMBSTONE_COMPACT_FRACTION auto-compaction trigger mid-query — the
#: equivalence is pytest-pinned, and the driver hash re-certifies it),
#: and docs_exact_dedup_changelog (the router now marks tombstone
#: segments). Tier 2 = the five r7-vintage weather rows deferred from
#: the r11 window (the refresh-queue head per the r11 verdict #3), then
#: the oldest remaining vintage: 32 of the 48 r8-vintage rows in module
#: order. 13 + 5 + 32 = 50 (the four late-r12 registrations —
#: mm_video_near_dup, events_daily_changelog, docs_substring_rewrite_asof
#: and the slots they cost rel_returned_items / rel_product_profit /
#: rel_promo_revenue — follow the rule that new never-green rows outrank
#: stale refreshes); the final 16 r8 rows carry r8 vintage one more
#: round and lead the r13 refresh queue.
_VERIFY_FIRST = (
    # --- tier 1: changed / new in round 12 ---
    "docs_minhash_pairs_changelog",  # NEW: CDC router over the LSH-bucket view
    "mm_audio_near_dup",             # NEW: audio modality row (rows-only)
    "mm_video_near_dup",             # NEW: video modality row (rows-only)
    "rel_count_sketch_retract",      # estimator column-collision rewrite
    "docs_exact_dedup_retract",      # tombstone-fraction trigger now in-row
    "docs_substring_rewrite_retract",
    "docs_bm25_topk_retract",
    "emb_ivf_topk_retract",          # + empty-embedding cell-stats fix family
    "docs_minhash_pairs_retract",    # + oracle prefix recomposition
    "events_daily_retract",
    "docs_exact_dedup_changelog",    # router marks tombstone segments now
    "events_daily_changelog",        # NEW: CDC router over the additive family
    "docs_substring_rewrite_asof",   # NEW: time-travel over the gram family
    # --- tier 2a: the five weather rows deferred from the r11 window ---
    "weather_date_range",
    "weather_derived_projection",
    "weather_icon_lookup",
    "weather_linear_fit",
    "weather_outlier_counts",
    # --- tier 2b: the r8-vintage tail, oldest remaining (32 of 48) ---
    "docs_chunk",
    "docs_dedup_clusters",
    "docs_dedup_decisions",
    "docs_dup_chunk_ratio",
    "docs_minhash_lsh_pairs",
    "docs_normalize",
    "docs_pack",
    "docs_pii_scrub",
    "docs_shard",
    "docs_split_assign",
    "emb_centroids_by_label",
    "emb_cosine_topk",
    "emb_hamming_topk",
    "emb_lsh_buckets",
    "emb_lsh_near_dup_pairs",
    "emb_pairwise_topk",
    "emb_quantize_int8",
    "emb_quantized_recall",
    "emb_quantized_topk",
    "rel_bottomk_quantiles",
    "rel_cube_lineitem",
    "rel_customer_ntile_segments",
    "rel_disjunctive_revenue",
    "rel_grouping_sets",
    "rel_kmv_intersection",
    "rel_large_orders",
    "rel_lost_customers",
    "rel_merge_upsert",
    "rel_min_cost_supplier",
    "rel_order_percentiles",
    "rel_pagerank",
    "rel_pricing_summary",
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
