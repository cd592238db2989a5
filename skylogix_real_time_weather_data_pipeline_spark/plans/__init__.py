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
#: Round-14 window (earlier windows live in git history and
#: WINDOW_LEDGER.json). Tier 1 = the five NEW rows (co-partitioned
#: pagerank, broadcast-join PSL domain mix, the URL membership
#: view's as-of + changelog rows — the as-of reader's 4th and the CDC
#: router's 5th certified families — and the bucketed-default stateful
#: operator driven as a real stream), every row over DEEP-changed
#: machinery this round — the whole URL family (the canonicalizer's
#: anchored-run tracking strip + the PSL registrable_domain), both
#: pagerank rows (per-iteration rank checkpoints in copart mode), the
#: substring *_indexed/segmented trio (shared-occ gram pass) and the
#: rewrite-from-index retract/asof rows (grams= parameter), and the
#: entire retract/changelog/as-of family again (matview.py moved: scoped
#: tmp sweeps, concurrent multi-batch applies, the same-population
#: tombstone-fraction denominator) — plus rel_approx_distinct_bounds
#: (its section was recomposed when the rows-only row retired). Tier 2 =
#: the refresh queue the r13 note promised (weather_warmest_coldest,
#: docs_bigram_logprob, docs_remove_dup_chunks) + the oldest r9-vintage
#: tail, filling to 50.
_VERIFY_FIRST = (
    # --- tier 1a: new in round 14 ---
    "rel_pagerank_copart",           # NEW: exchange-free-edge-side iterations
    "docs_domain_mix_psl",           # NEW: broadcast-join PSL path
    "docs_url_dedup_asof",           # NEW: as-of reader's 4th family
    "docs_url_dedup_changelog",      # NEW: CDC router's 5th family
    "stream_running_key_stats",      # NEW: bucketed-default stateful op, real stream
    "docs_pii_stats",                # NEW: PII detection (two-engine regex differential)
    "docs_pii_redact",               # NEW: ordered PII redaction
    "docs_html_strip",               # NEW: HTML-to-text extraction
    "docs_pack_chunks",              # NEW: sequence packing (2-phase cumsum)
    # --- tier 1b: URL machinery changed (canonicalizer anchored-run
    #     strip, InSet/PSL registrable_domain) ---
    "docs_url_canonical",
    "docs_url_dedup",
    "docs_domain_mix",
    "docs_url_decontaminate",
    "docs_url_dedup_retract",
    "docs_url_blocklist",
    # --- tier 1c: pagerank machinery changed (copartition mode) ---
    "rel_pagerank",
    # --- tier 1d: gram-index read/maintenance machinery changed
    #     (shared-occ pass, occ-fed applier, grams= rewrite) ---
    "docs_substring_rewrite_segmented",
    "docs_substring_rewrite_indexed",
    "docs_substring_dedup_indexed",
    "docs_substring_pairs_indexed",
    "docs_substring_rewrite_retract",
    "docs_substring_rewrite_asof",
    # --- tier 1e: segment machinery family (matview.py moved: scoped tmp
    #     sweeps, concurrent applies, fraction denominator) ---
    "events_daily_retract",
    "events_daily_changelog",
    "docs_exact_dedup_retract",
    "docs_exact_dedup_changelog",
    "docs_exact_dedup_asof",
    "docs_minhash_pairs_retract",
    "docs_minhash_pairs_changelog",
    "docs_bm25_topk_retract",
    "docs_bm25_topk_asof",
    "docs_bm25_topk_changelog",
    "emb_ivf_topk_retract",
    "rel_count_sketch_retract",
    # --- tier 1f: approx-distinct section recomposed (raw row retired) ---
    "rel_approx_distinct_bounds",
    # --- tier 2: refresh queue (r13 note) + oldest r9 vintage ---
    "weather_warmest_coldest",
    "docs_bigram_logprob",
    "docs_remove_dup_chunks",
    "docs_bm25_topk_indexed",
    "docs_dedup_clusters_incremental",
    "docs_distill_filter",
    "docs_simhash_near_pairs",
    "docs_source_kl",
    "docs_stratified_sample",
    "docs_substring_dedup",
    "docs_substring_pairs",
    "docs_substring_rewrite",
    "docs_token_entropy",
    "docs_unigram_logprob",
    "docs_winnowing_pairs",
    "docs_zipf_fit",
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
