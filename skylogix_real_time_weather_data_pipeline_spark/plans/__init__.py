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
#: Round-10 window (the r1-r9 window history lives in git — this block at
#: earlier tags — and WINDOW_LEDGER.json). Tier 1 = the rows changed or
#: created this round: the ADVICE fixes (duplicate-id UNION sizes in the
#: carried-sizes ngram Jaccard + its estimator consumer; budget_select
#: typed offsets/NULL rejection; keep_best LEFT-joined scores), the NEW
#: frozen-model inference row (docs_distill_score), the TWO new
#: maintained-gram-index read paths completing the streaming ExactSubstr
#: triad (spans + pairs — their oracles are byte-identical to their
#: one-shot twins' BY CONTRACT, so a driver green certifies the
#: maintained-count and posting-list machinery itself), and the rewrite
#: *_indexed row re-certified because the view it reads gained the
#: posting-list columns this round. Tier 2 = the ONLY remaining stale
#: vintage: the 35 rows last driver-green in r6. 15 + 35 = 50 slots — the window is
#: exactly full; after this round every ledger row should have
#: last_green ≥ 7.
_VERIFY_FIRST = (
    # --- tier 1: changed / new in round 10 ---
    "docs_ngram_jaccard_pairs",       # duplicate-id union-size correction
    "docs_minhash_jaccard_estimate",  # consumes the corrected exact-Jaccard
    "docs_dedup_keep_best",           # scores LEFT-joined, NULLs rank last
    "docs_budget_select",             # typed offsets frame + NULL rejection
    "docs_distill_score",             # NEW: frozen-model inference scan
    "docs_substring_dedup_indexed",   # NEW: spans from the maintained view
    "docs_substring_pairs_indexed",   # NEW: pairs from capped posting lists
    "docs_substring_rewrite_indexed", # view schema gained ids/over (r10)
    "docs_bm25_topk",                 # single tokenize pass (persisted proj, r10)
    "docs_hybrid_rrf",                # consumes the fused BM25 branch (r10)
    "emb_semdedup",                   # per-cluster block gemm kernel (r10)
    "docs_minhash_pairs_indexed",     # NEW: pairs from the maintained LSH buckets
    "docs_exact_dedup_indexed",       # NEW: maintained fingerprint view
    "docs_source_cap",                # NEW: per-source document cap
    "emb_kmeans_arrow",               # NEW: large-k Arrow Lloyd kernel
    # --- tier 2: the whole remaining r6-vintage tail (35 rows) ---
    "docs_lang_source_chisq",
    "docs_minhash_signatures",
    "docs_token_stats",
    "docs_top_ngrams",
    "docs_winnowing",
    "events_cumulative_users",
    "events_props_stats",
    "events_props_variant",
    "rel_ams_f2",
    "rel_bloom_semijoin",
    "rel_cms_heavy_hitters",
    "rel_customers_without_orders",
    "rel_hll_distinct",
    "rel_hll_monthly_customers",
    "rel_hll_rolling_distinct",
    "rel_kmv_distinct",
    "rel_latest_order_per_customer",
    "rel_parts_shipped",
    "rel_priority_sample_revenue",
    "rel_rolling_revenue",
    "rel_rollup_lineitem",
    "rel_running_order_total",
    "rel_set_ops",
    "stream_dedup_keyed",
    "stream_range_join_windows",
    "stream_sessionize",
    "stream_sliding_6h",
    "stream_tumbling_daily",
    "stream_window_topk",
    "weather_clean_outliers",
    "weather_condition_histogram",
    "weather_condition_mode_by_city",
    "weather_daily_pivot",
    "weather_exact_median",
    "weather_temperature_trends",
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
