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
#: Round-11 window (the r1-r10 window history lives in git — this block at
#: earlier tags — and WINDOW_LEDGER.json). Tier 1 = the registry's one
#: never-driver-green row (docs_substring_rewrite_segmented, registered
#: post-window in r10 — a driver hash on it certifies the whole LSM
#: write/compact/merge protocol end to end), the TWO new r11 rows
#: (retractable exact-dedup via Z-set tombstone segments; the rows-only
#: multimodal pHash near-dup pipeline), and every row whose deep
#: implementation moved this round: the *_indexed rows over views whose
#: delta builders gained the integral-id contract + legacy-schema
#: backfill and whose segment protocol gained reader-safety +
#: auto-compaction, and the two Arrow-kernel rows whose rounding switched
#: from numpy half-even to HALF_UP (grid ties can flip values).
#: Tier 2 = the ONLY remaining stale vintage: the 37 rows last
#: driver-green in r7. The four late r11 rows (emb_ivf_topk_retract —
#: vector deletes over Z-set IVF postings; rel_count_sketch_retract —
#: turnstile Count-Sketch counters, constant-size segments by linearity;
#: docs_exact_dedup_changelog — the CDC writeStream routing end to end;
#: events_daily_retract — the reference-shaped additive view under
#: deletes; docs_minhash_pairs_retract — LSH pairs from the retracted
#: bucket view, closing the retraction family's last uncertified read)
#: are tier 1 with the other never-driver-green rows, as is
#: docs_exact_dedup_asof (time-travel read, pre-delete snapshot). 18
#: tier-1 + 37 tier-2 = 55 for 50 slots: the final five r7-tail rows
#: (weather_date_range, weather_derived_projection, weather_icon_lookup,
#: weather_linear_fit, weather_outlier_counts) fall past the window and
#: carry r7 vintage one more round — new never-green rows outrank
#: stale-but-unchanged refreshes; they lead the r12 refresh queue.
_VERIFY_FIRST = (
    # --- tier 1: changed / new in round 11 ---
    "docs_substring_rewrite_segmented",  # NEVER driver-green; LSM protocol E2E
    "docs_exact_dedup_retract",          # NEW: Z-set deletion/retraction
    "docs_substring_rewrite_retract",    # NEW: retraction on the gram index
    "docs_bm25_topk_retract",            # NEW: retraction on the term stats
    "emb_ivf_topk_retract",              # NEW: vector deletes for the ANN index
    "rel_count_sketch_retract",          # NEW: turnstile Count-Sketch counters
    "docs_exact_dedup_changelog",        # NEW: CDC changelog maintainer E2E
    "events_daily_retract",              # NEW: reference-shaped view retracts
    "docs_minhash_pairs_retract",        # NEW: LSH pairs after a delete
    "docs_exact_dedup_asof",             # NEW: time-travel read (pre-delete)
    "mm_phash_near_dup",                 # NEW: multimodal codec row (rows-only)
    "docs_substring_dedup_indexed",      # gram delta: id contract + backfill
    "docs_substring_pairs_indexed",      # gram posting lists (same delta)
    "docs_substring_rewrite_indexed",    # gram cnt/min_okey (same delta)
    "docs_minhash_pairs_indexed",        # bucket delta: id contract
    "docs_exact_dedup_indexed",          # fingerprint view (shared protocol)
    "emb_kmeans_arrow",                  # HALF_UP rounding in the kernel
    "emb_semdedup",                      # HALF_UP rounding in the block gemm
    # --- tier 2: the whole remaining r7-vintage tail (37 rows) ---
    "docs_bpe_token_count",
    "docs_curation_pipeline",
    "docs_decontaminate",
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_language_id",
    "docs_mixture_sample",
    "docs_quality_filter",
    "docs_quality_topk_per_source",
    "docs_repetition_stats",
    "docs_simhash",
    "docs_temperature_mixture",
    "docs_tfidf_topk",
    "docs_token_quantiles_by_lang",
    "emb_ivf_quantized_topk",
    "emb_ivf_topk",
    "emb_kmeans",
    "events_funnel",
    "events_gap_fill",
    "events_retention",
    "events_top_transitions",
    "rel_approx_distinct",
    "rel_distinct_parts",
    "rel_fuzzy_part_names",
    "rel_late_shipment_priority",
    "rel_order_count_distribution",
    "rel_salted_join",
    "rel_scd2_apply",
    "rel_waiting_suppliers",
    "rel_yearly_growth",
    "sql_priority_with_exists",
    "sql_recursive_chains",
    "weather_date_range",
    "weather_derived_projection",
    "weather_icon_lookup",
    "weather_linear_fit",
    "weather_outlier_counts",
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
