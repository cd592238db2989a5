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
#: Round-8 window (the r1-r7 window history lives in git — this block at
#: earlier tags — and WINDOW_LEDGER.json). Tier 1 = the 9 rows changed or
#: new this round: the pre-aggregated cube rewrite, the bottom-k
#: empty-sample LEFT-join contract fix (query + oracle), the two
#: global-rank consumers (deterministic hash-bucket partitioning replaced
#: sampled ranges in operators/shuffle.py — deep change, shallow
#: fingerprint), the new exact substring-run dedup, and the 4 rows whose
#: registry fingerprints moved AFTER r7's mid-round ledger write (the
#: driver re-greened the final r7 code, but the ledger can't know that —
#: re-window them rather than argue). Tier 2 = the END of the
#: certification drain (r7 verdict #1): all 41 remaining rows last
#: driver-green in r3/r4 (the 9 deferred single-fact r3 aggregates + the
#: 32 remaining r4 rows; rel_cube_lineitem graduated to tier 1),
#: oldest-first within vintage. 9 + 41 = the full 50-slot window; after
#: this round no ledger row should have last_green < 5.
_VERIFY_FIRST = (
    # --- tier 1: changed or new in round 8 ---
    "rel_cube_lineitem",       # cube over finest-grouping pre-aggregate
    "rel_bottomk_quantiles",   # empty-sample LEFT join (query + oracle)
    "docs_shard",              # global_rank: hash-bucket partitioning
    "docs_split_assign",       # global_rank consumer (same deep change)
    "docs_substring_dedup",    # NEW: exact substring-run dedup
    "rel_merge_upsert",        # integer-cent repricing (sf0.1 spot found
                               # an engine-divergent double ROUND tie)
    "rel_pagerank",            # late-r7 fingerprint (ledger re-window)
    "rel_triangle_count",      # late-r7 fingerprint (ledger re-window)
    "rel_kmv_intersection",    # late-r7 fingerprint (ledger re-window)
    # docs_distill_filter is the 4th late-r7 fingerprint mover, displaced
    # when the sf0.1 spot-check's merge_upsert find took its slot: its
    # code is byte-identical to what the r7 driver run greened (the
    # fingerprint moved only because the ledger was written mid-r7), it
    # is typed-local-green this round, and it is the most expensive row
    # to drive (15 training jobs). Re-certify in r9 if the ledger flags.
    # --- tier 2a: the 9 deferred r3-vintage single-fact aggregates ---
    "rel_disjunctive_revenue",
    "rel_large_orders",
    "rel_lost_customers",
    "rel_product_profit",
    "rel_promo_revenue",
    "rel_returned_items",
    "rel_small_qty_revenue",
    "rel_top_supplier",
    "rel_volume_shipping",
    # --- tier 2b: the whole remaining r4-vintage tail (32 rows) ---
    "docs_chunk",
    "docs_dedup_clusters",
    "docs_dedup_decisions",
    "docs_dup_chunk_ratio",
    "docs_minhash_lsh_pairs",
    "docs_normalize",
    "docs_pack",
    "docs_pii_scrub",
    "emb_centroids_by_label",
    "emb_cosine_topk",
    "emb_hamming_topk",
    "emb_lsh_buckets",
    "emb_lsh_near_dup_pairs",
    "emb_pairwise_topk",
    "emb_quantize_int8",
    "emb_quantized_recall",
    "emb_quantized_topk",
    "rel_customer_ntile_segments",
    "rel_grouping_sets",
    "rel_min_cost_supplier",
    "rel_order_percentiles",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_segment_monthly",
    "rel_shipping_priority",
    "rel_supplier_part_counts",
    "rel_top_customers_per_nation",
    "rel_unpivot_city_metrics",
    "sql_forecast_revenue",
    "stream_asof_last_purchase",
    "stream_hopping_distinct",
    "weather_quantile_summary",
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
