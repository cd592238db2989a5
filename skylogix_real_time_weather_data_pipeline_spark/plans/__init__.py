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
#: Round-9 window (the r1-r8 window history lives in git — this block at
#: earlier tags — and WINDOW_LEDGER.json). Tier 1 = the 7 rows changed
#: this round plus the one UNVERIFIED carry-over: the two never-driver-
#: green post-window registrations from r8 (substring rewrite + pairs —
#: both also changed again this round: NULL-text coalesce, enforced
#: order-encoding bounds, map-side distinctness), the substring stats row
#: (shares the changed _doc_gram_hashes preamble), the rewritten
#: carried-sizes ngram Jaccard and its estimator consumer, the winnowing
#: pair detector (distinct-exchange removal), and docs_distill_filter
#: (code byte-identical to what the r7 driver greened; the ledger's one
#: UNVERIFIED row — displaced from the r8 window by the merge_upsert
#: find), plus the NEW maintained-gram-index rewrite (its oracle is
#: byte-identical to docs_substring_rewrite's by contract, so the driver
#: hash-certifies the matview machinery). Tier 2 = the ONLY remaining
#: stale vintage: the 28 rows last driver-green in r5 (one of them, the
#: estimator, graduated to tier 1 as a changed row). 14 + 27 = 41 slots —
#: 9 of headroom; after this round every ledger row should have
#: last_green ≥ 6. The three NEW *_indexed/_incremental rows share their
#: oracles with their one-shot twins BY CONTRACT (maintained view ==
#: recompute), so a driver green on them certifies the matview /
#: incremental machinery itself.
_VERIFY_FIRST = (
    # --- tier 1: changed in round 9 / never driver-green ---
    "docs_substring_rewrite",   # NEVER; shared-preamble + bounds + matview refactor
    "docs_substring_pairs",     # NEVER; map-side distinctness (one less exchange)
    "docs_substring_dedup",     # shared-preamble NULL-text coalesce (query+oracle)
    "docs_ngram_jaccard_pairs", # carried-sizes rewrite (persist + 2 joins dropped)
    "docs_minhash_jaccard_estimate",  # consumes the rewritten inverted index
    "docs_winnowing_pairs",     # distinct-exchange removal
    "docs_substring_rewrite_indexed",  # NEW: maintained gram-index rewrite
    "docs_bm25_topk_indexed",   # NEW: scoring vs the maintained term-stats view
    "docs_dedup_clusters_incremental",  # NEW: 2-batch incremental CC == one-shot
    "docs_bigram_logprob",      # LM build: _let-bound tokens + compute spread
                                # (was single-core; 6.9 -> 1.4 s drained)
    "rel_triangle_count",       # oracle gained MATERIALIZED CTE hints
                                # (value-neutral; sf0.01/0.1/1x re-verified)
    "docs_dedup_keep_best",     # NEW: quality-aware cluster survivor selection
    "docs_budget_select",       # NEW: token-budget greedy-prefix selection
    "docs_distill_filter",      # UNVERIFIED carry-over (byte-identical to r7 green)
    # --- tier 2: the whole remaining r5-vintage tail (27 rows; the 28th,
    # the estimator, sits in tier 1 as a changed row) ---
    "docs_bm25_topk",
    "docs_hybrid_rrf",
    "docs_remove_dup_chunks",
    "docs_simhash_near_pairs",
    "docs_source_kl",
    "docs_stratified_sample",
    "docs_token_entropy",
    "docs_unigram_logprob",
    "docs_zipf_fit",
    "emb_filtered_recall",
    "emb_ivf_filtered_topk",
    "emb_ivf_recall",
    "emb_ivfpq_topk",
    "emb_matryoshka_recall",
    "emb_matryoshka_topk",
    "emb_mmr_rerank",
    "emb_pca_top_component",
    "emb_pq_adc_topk",
    "emb_pq_recall",
    "events_ab_test",
    "events_anomaly_mad",
    "rel_equi_depth_histogram",
    "rel_market_share",
    "rel_supplier_value",
    "stream_window_percentiles",
    "weather_humidity_decile_agg",
    "weather_winsorized_stats",
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
