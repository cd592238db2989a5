"""Plan-quality regression tests: pin the physical-plan properties the
100 TB design depends on (column pruning, filter pushdown, single-scan
aggregation, single-evaluation of expensive subtrees). A correctness-green
query whose plan silently regresses to extra scans or double evaluation is
a scale bug — these assertions catch that in CI, not in a cluster bill.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as ENTRY


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def qs():
    return ENTRY.queries()


def test_mixture_sample_prunes_text_column(spark, sf_dir, qs):
    """The sampling decision needs only (doc_id, source); reading the wide
    text column would make the 'cheap' mixing pass scan the whole corpus
    payload."""
    plan = _formatted(qs["docs_mixture_sample"](spark, sf_dir))
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("text" not in s for s in schemas)


def test_pricing_summary_pushes_date_filter_to_scan(spark, sf_dir, qs):
    plan = _formatted(qs["rel_pricing_summary"](spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1)


def test_quantile_summary_is_single_scan(spark, sf_dir, qs):
    plan = _physical(qs["weather_quantile_summary"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1


def test_simhash_near_pairs_single_evaluation_no_join(spark, sf_dir, qs):
    """The r2 formulation self-joined the chunked fingerprints, evaluating
    the whole tokenize→hash→vote pipeline twice."""
    plan = _physical(qs["docs_simhash_near_pairs"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1
    assert "Join" not in plan


def test_lsh_near_dup_pairs_single_arrow_eval_per_udf(spark, sf_dir, qs):
    """Bucket matmul and pairwise verify must each appear once: the
    self-join / pushed-filter / threshold-filter shapes each duplicated an
    Arrow stage before round 3."""
    plan = _physical(qs["emb_lsh_near_dup_pairs"](spark, sf_dir))
    assert len(re.findall(r"ArrowEvalPython \[_buckets", plan)) == 1
    assert len(re.findall(r"ArrowEvalPython \[_score", plan)) == 1


def test_merge_upsert_anti_join_reads_keys_only(spark, sf_dir, qs):
    """The anti-join's source-keys side must scan only the merge key, not
    the full row set."""
    plan = _formatted(qs["rel_merge_upsert"](spark, sf_dir))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert any(s == "o_orderkey:bigint" for s in schemas)


def test_revenue_by_nation_broadcasts_dim(spark, sf_dir, qs):
    plan = _physical(qs["rel_revenue_by_nation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_injects_on_selective_build_side(spark, sf_dir):
    """At 100 TB a shuffle join whose build side carries a selective filter
    should semi-join-reduce the probe side before the exchange: Spark's
    InjectRuntimeFilter adds a bloom_filter_agg on the build side and a
    might_contain predicate on the probe scan. Pinned here with the local
    thresholds lowered (the defaults only fire above 10 GB probe scans —
    i.e. exactly the cluster case; broadcast joins are rightly exempt)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        s = spark.read.parquet(f"{sf_dir}/supplier.parquet").filter("s_acctbal > 9000")
        j = li.join(s, li.l_suppkey == s.s_suppkey).groupBy("s_nationkey").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_funnel_is_single_scan_single_shuffle(spark, sf_dir, qs):
    """The ordered funnel folds all stage arrivals from one per-user
    aggregation — a k-way self-join (k scans, 2k shuffles) computing the
    same answer is the regression this pins against."""
    plan = _physical(qs["events_funnel"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1
    assert len(re.findall(r"Exchange (?:hash|range)", plan)) == 1


def test_aqe_splits_skewed_join_partition(spark):
    """The automatic complement to operators/joins.salted_join: when skew
    only shows up at runtime, AQE must detect the oversized shuffle
    partition and split it (SortMergeJoin(skew=true) + 'AQEShuffleRead
    … skewed' in the final adaptive plan). Thresholds lowered to make a
    local frame register as skewed; at cluster scale the defaults fire."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 10 = 0 THEN id ELSE 7 END AS k", "id AS payload"
        )
        small = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
        j = big.join(small, "k")
        j.collect()
        plan = _physical(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_quality_filter_is_zero_shuffle(spark, sf_dir, qs):
    """The Gopher rule filter is a pure narrow projection — any Exchange
    here means a regression from scan-speed to shuffle-bound."""
    plan = _physical(qs["docs_quality_filter"](spark, sf_dir))
    assert "Exchange" not in plan
    assert len(re.findall(r"FileScan", plan)) == 1


def test_tfidf_single_explode_no_dfreq_join(spark, sf_dir, qs):
    """Document frequency comes from a window over the tf intermediate,
    not a join back to a second explode+agg of the same subtree: exactly
    one Generate (explode) in the plan, and the only join is the 1-row
    corpus-size broadcast."""
    plan = _physical(qs["docs_tfidf_topk"](spark, sf_dir))
    assert len(re.findall(r"\bGenerate\b", plan)) == 1
    # documents.parquet scanned at most twice: data pass + count-only pass
    assert plan.count("documents.parquet") <= 2


def test_promo_revenue_pushes_month_filter(spark, sf_dir, qs):
    plan = _formatted(qs["rel_promo_revenue"](spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*l_shipdate[^\]]*)\]", plan)
    assert pushed is not None


def test_top_transitions_three_exchanges_max(spark, sf_dir, qs):
    """user-window sort, pair-count agg, prev-type share window — nothing
    else may shuffle."""
    plan = _physical(qs["events_top_transitions"](spark, sf_dir))
    assert len(re.findall(r"Exchange (?:hash|range)partitioning", plan)) <= 3


def test_curation_pipeline_is_single_scan_single_shuffle(spark, sf_dir, qs):
    """Filter + split + token-count compose as EXPRESSIONS over one scan
    (gopher_features / split_expr) — a join-on-doc_id composition would
    triple the scan count."""
    plan = _physical(qs["docs_curation_pipeline"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1
    assert len(re.findall(r"Exchange (?:hash|range)partitioning", plan)) <= 1


def test_waiting_suppliers_single_lineitem_scan(spark, sf_dir, qs):
    """Q21's EXISTS + NOT EXISTS are folded into the per-order aggregation:
    lineitem must be scanned ONCE, not three times (l1/l2/l3), and the only
    non-broadcast joins are lineitem↔orders and the two dim attaches."""
    plan = _physical(qs["rel_waiting_suppliers"](spark, sf_dir))
    assert len(re.findall(r"FileScan parquet.*lineitem", plan)) == 1


def test_large_orders_single_lineitem_scan(spark, sf_dir, qs):
    """Q18's HAVING subquery form re-scans lineitem to re-sum quantities;
    the single-aggregation plan must not."""
    plan = _physical(qs["rel_large_orders"](spark, sf_dir))
    assert len(re.findall(r"FileScan parquet.*lineitem", plan)) == 1


def test_semdedup_checkpoints_assignment_no_lloyd_reeval(spark, sf_dir, qs):
    """The k-means assignment feeds both the block-drop computation and
    the decision join; the localCheckpoint must stop Spark re-evaluating
    the Lloyd subtree per branch — only the vector-attach scan(s) of
    embeddings may remain (r10: the block kernel attaches vectors once,
    so ≤ 2 keeps headroom for the pre-r10 pair form too)."""
    plan = _physical(qs["emb_semdedup"](spark, sf_dir))
    assert len(re.findall(r"FileScan parquet.*embeddings", plan)) <= 2
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_hamming_topk_no_shuffle_topk_only(spark, sf_dir, qs):
    """Binary ANN must stay a narrow integer pass: the only exchange is the
    1-row broadcast of the query codes, and the global top-k runs as
    TakeOrderedAndProject — no full sort, no data shuffle."""
    plan = _physical(qs["emb_hamming_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    n_exchange = len(re.findall(r"Exchange", plan))
    n_broadcast = len(re.findall(r"BroadcastExchange", plan))
    assert n_exchange == n_broadcast == 1


def test_dup_chunk_ratio_two_shuffles_one_scan(spark, sf_dir, qs):
    """Corpus-wide chunk counting needs exactly the (chunk-hash window,
    doc groupBy) shuffles over ONE scan of the text — a joined-back
    formulation would rescan or re-shuffle the payload."""
    plan = _physical(qs["docs_dup_chunk_ratio"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_supplier_part_counts_dims_broadcast(spark, sf_dir, qs):
    """part and the exclusion set are dimension-sized: both must broadcast
    so the only fact movement is the distinct-agg shuffle."""
    plan = _physical(qs["rel_supplier_part_counts"](spark, sf_dir))
    assert len(re.findall(r"BroadcastExchange", plan)) == 2
    assert "SortMergeJoin" not in plan


def test_min_cost_supplier_windows_aggregate_not_facts(spark, sf_dir, qs):
    """The rank-1 window must run over the per-(part,supplier) aggregate —
    a window over raw lineitem would sort the fact table."""
    plan = _physical(qs["rel_min_cost_supplier"](spark, sf_dir))
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # executedPlan prints top-down: the window sits ABOVE the aggregate
    assert win_pos < agg_pos
    assert len(re.findall(r"BroadcastExchange", plan)) == 2


def test_matryoshka_shortlist_is_take_ordered(spark, sf_dir, qs):
    """Both stages must be TakeOrderedAndProject (global top-k without a
    full sort), and the corpus is scanned exactly once — the re-rank runs
    on the shortlist rows, never a second scan."""
    plan = _physical(qs["emb_matryoshka_topk"](spark, sf_dir))
    assert len(re.findall(r"TakeOrderedAndProject", plan)) == 2
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_pagerank_iteration_joins_and_exact_fold(spark, sf_dir, qs):
    """The per-iteration rank fold must aggregate LONGs (integer units, no
    decimal/BigDecimal buffer) and the checkpointed edge list must not be
    recomputed: no parquet scan appears in the final iteration's plan —
    only the checkpoint scans. The fact join runs exactly once, at edge
    checkpoint time, BEFORE this plan exists."""
    plan = _physical(qs["rel_pagerank"](spark, sf_dir))
    assert "Scan parquet" not in plan  # inputs come from the localCheckpoints
    assert "ExistingRDD" in plan or "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_pagerank_first_iteration_joinless_no_node_reattach(spark, sf_dir, qs):
    """Two structural wins pinned: (1) iteration 1 contributes
    round(const·share) — a map over the share table, NOT a ranks⋈edges
    join, because the uniform init is a constant; (2) the symmetric graph
    passes complete_in_degree, so no per-iteration nodes-left-join
    re-attach. Net: exactly ONE join total for 2 iterations (it2's
    ranks⋈share) beyond the share build's edges⋈outw — i.e. at most 3
    join operators in the whole executed plan, and no LeftOuter
    anywhere."""
    plan = _physical(qs["rel_pagerank"](spark, sf_dir))
    n_joins = len(re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan))
    # share build join appears once per iteration reference (2) + the it2
    # ranks join = 3; the old shape had 5+ (init join, per-iter re-attach)
    assert n_joins <= 3, f"unexpected join count {n_joins}"
    assert "LeftOuter" not in plan


def _walk_live_plan(df) -> list[tuple[str, str]]:
    """(className, simpleString) for every LIVE node of the executed plan:
    descends through AQE wrapper/stage nodes, stops at InMemoryTableScan
    (the cached build subtree is not live work). The df must have been
    executed first so AQE final plans are in place."""
    out: list[tuple[str, str]] = []

    def rec(node):
        name = node.getClass().getSimpleName()
        out.append((name, node.simpleString(200)))
        if name == "AdaptiveSparkPlanExec":
            kids = [node.executedPlan()]
        elif name.endswith("QueryStageExec"):
            kids = [node.plan()]
        elif name == "InMemoryTableScanExec":
            kids = []
        else:
            seq = node.children()
            kids = [seq.apply(i) for i in range(seq.size())]
        for k in kids:
            rec(k)

    rec(df._jdf.queryExecution().executedPlan())
    return out


def test_pagerank_copart_share_side_exchange_free(spark):
    """r14 (r13 verdict #3): with copartition=True the edge-sized share
    frame is cached hash-partitioned + sorted on its source key and every
    iteration's join must consume that cached scan DIRECTLY — zero
    Exchange or Sort on the share side, and no silent rebuild of the
    share from raw edges (the failure mode this pins: re-aliased nested
    cache references failing sameResult, which re-ran the edges⋈outw
    build per iteration). Broadcast is disabled so the join exercises
    the co-partitioned path a 100 TB run would take; every live shuffle
    must partition on the rank/node key only — O(V) traffic, never the
    O(E) edges."""
    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.operators.graph import (
        pagerank,
    )

    saved = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        n = 2000
        edges = spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst"),
            F.lit(1).alias("weight"))
        df = pagerank(edges, n_iter=3, complete_in_degree=True, n_nodes=n,
                      copartition=True)
        df.count()  # execute: AQE final plans + per-iteration checkpoints
        nodes = _walk_live_plan(df)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    names = [n for n, _ in nodes]
    assert "InMemoryTableScanExec" in names, "share cache not consumed"
    exchanges = [s for n, s in nodes if n == "ShuffleExchangeExec"]
    assert exchanges, "expected the inherent transpose shuffle"
    for s in exchanges:
        assert "hashpartitioning(node" in s, (
            f"non-node-keyed live shuffle (share re-exchanged or rebuilt): {s}")
    sorts = [s for n, s in nodes if n == "SortExec"]
    for s in sorts:
        assert "e_src" not in s, f"share side re-sorted: {s}"
    # a rebuild would surface the edges⋈outw join on src: the only live
    # join keys allowed are the iteration join's (e_src == node)
    joins = [s for n, s in nodes
             if n in ("SortMergeJoinExec", "ShuffledHashJoinExec",
                      "BroadcastHashJoinExec")]
    for s in joins:
        assert "[e_src" in s and "[node" in s, f"unexpected live join: {s}"


def test_pagerank_copart_registered_row_no_fact_rescan(spark, sf_dir, qs):
    """The registered rel_pagerank_copart row inherits the shared
    checkpointed co-trade frame: zero parquet scans in its final plan
    (same contract as rel_pagerank), plus the cached share scan."""
    df = qs["rel_pagerank_copart"](spark, sf_dir)
    df.count()
    plan = _physical(df)
    assert "Scan parquet" not in plan
    assert "InMemoryTableScan" in plan


def test_graph_queries_share_co_trade_frame(spark, sf_dir, qs):
    """rel_pagerank and rel_triangle_count both branch from the SAME
    memoized, checkpointed co-trade pair frame (plans/_shared.py): the
    lineitem⋈orders fact join is evaluated once per session, and the
    second query's plan reads only checkpointed rows — zero parquet
    scans. A regression here doubles the dominant fact-join cost."""
    from skylogix_real_time_weather_data_pipeline_spark.plans._shared import (
        co_trade_pair_counts,
    )

    first = co_trade_pair_counts(spark, sf_dir)
    assert co_trade_pair_counts(spark, sf_dir) is first  # memo hit
    for name in ("rel_pagerank", "rel_triangle_count"):
        plan = _physical(qs[name](spark, sf_dir))
        assert "Scan parquet" not in plan, f"{name} re-scans the fact tables"


def test_triangle_orientation_is_degree_descending(spark):
    """On a skewed star-plus-edge graph the hub must emit NO wedges: each
    star edge is directed toward the hub (higher degree), so out-wedges
    only form at low-degree vertices — the Suri & Vassilvitskii bound the
    100 TB story depends on. The id-ordered orientation this replaced
    would have fanned the hub (smallest id) into d·(d−1)/2 wedge rows."""
    from skylogix_real_time_weather_data_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    # hub 1 connected to 2..41; one closing edge (2,3) → exactly 1 triangle
    edges = spark.createDataFrame(
        [(1, i) for i in range(2, 42)] + [(2, 3)], ["a", "b"]
    )
    row = triangle_stats(edges).collect()[0]
    assert row.n_triangles == 1
    assert row.n_nodes == 41 and row.n_edges == 41
    # hub degree 40 dominates; vertices 2 and 3 (degree 2) add 1 wedge each
    assert row.n_wedges == 40 * 39 // 2 + 2


def test_triangle_pins_degree_and_oriented_frames(spark, sf_dir, qs):
    """`deg` feeds three consumers (wedge-count fold + both endpoint
    joins) and `oriented` feeds three more (both wedge sides + the
    closure probe). Both must serve from the cache (InMemoryTableScan in
    every consumer's branch) — unpinned, Spark re-executes the degree
    groupBy and the double endpoint join once per consumer, which
    measured 8.8× growth at 10× input (SCALING_r07 pre-fix)."""
    from skylogix_real_time_weather_data_pipeline_spark.cache import (
        release_owned_caches,
    )

    release_owned_caches(spark)
    try:
        plan = _physical(qs["rel_triangle_count"](spark, sf_dir))
        # 3 oriented consumers + 2 deg consumers read the cached frames
        # (deg's third consumer is inside the cached oriented build)
        assert len(re.findall(r"InMemoryTableScan", plan)) >= 5, plan
    finally:
        release_owned_caches(spark)


def test_triangle_pair_count_shuffles_on_pair_key(spark, sf_dir):
    """The shared-customer pair count must shuffle on the PAIR key before
    aggregating: per-map-task pair duplication is <1, so a pre-shuffle
    combine collapses nothing but pays a multi-million-entry hash map per
    task (sf1x pair stage 10.8s vs 4.5s with the repartition). Probed on
    the exposed helper — the localCheckpoint inside rel_triangle_count
    hides this subtree from the final executed plan."""
    from skylogix_real_time_weather_data_pipeline_spark.plans.sketches import (
        co_supplier_shared_counts,
    )

    plan = _physical(co_supplier_shared_counts(spark, sf_dir))
    # r15: the pair key ships PACKED as one bigint (a·2³² + b — guide
    # §2.3 narrower types: the pair stream is the dominant exchange and
    # one long shuffles ~40% fewer bytes than two), so the exchange
    # partitioning is the single packed column, unpacked only after the
    # aggregate
    m = re.search(r"Exchange hashpartitioning\((ab#\d+L?), (\d+)\)", plan)
    assert m, plan
    # the exchange feeds the aggregate directly (REPARTITION_BY_COL shows
    # as the shuffle origin, not ENSURE_REQUIREMENTS from the groupBy)
    assert "REPARTITION_BY" in plan.split(m.group(0))[1].split("\n")[0], plan


def test_anomaly_mad_broadcasts_group_tables(spark, sf_dir, qs):
    """Both per-group stats tables (median, MAD — checkpoint-materialized,
    so each is computed once, not once per reference) attach by
    broadcast; the fact rows are never shuffle-joined on event_type."""
    plan = _physical(qs["events_anomaly_mad"](spark, sf_dir))
    assert len(re.findall(r"BroadcastExchange", plan)) == 2
    # the only hash exchanges are the tiny per-type aggregations
    assert all(
        "event_type" in l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l
    )


def test_cumulative_users_windows_daily_frame_not_events(spark, sf_dir, qs):
    """The running total must window the per-day aggregate (above BOTH
    aggregations in the plan), never the raw event rows."""
    plan = _physical(qs["events_cumulative_users"](spark, sf_dir))
    win_pos = plan.find("Window")
    aggs = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    assert win_pos != -1 and aggs
    assert all(win_pos < a for a in aggs)


def test_bm25_two_scans_early_postings_filter(spark, sf_dir, qs):
    """BM25 reads the corpus exactly twice (postings branch + 1-row
    stats scalar); the zero-match filter must sit in the scan stage so
    non-matching documents never reach an exchange, and the global
    top-k must be TakeOrderedAndProject, never a full sort."""
    df = qs["docs_bm25_topk"](spark, sf_dir)
    plan = _physical(df)
    assert len(re.findall(r"FileScan|Scan parquet", plan)) == 2
    assert "TakeOrderedAndProject" in plan
    fmt = _formatted(df)
    # the size(...)>0 postings filter appears below the repartition
    # exchange (Filter directly over the scan in the formatted tree)
    filt = fmt.index("Filter")
    exch = fmt.index("Exchange")
    assert filt > exch  # formatted lists top-down: Exchange above Filter


def test_hybrid_rrf_fuses_shortlists_not_corpora(spark, sf_dir, qs):
    """RRF joins two O(N) shortlists: the corpus-side work is the two
    bounded top-N selections (TakeOrderedAndProject); the fusion join
    itself must not move corpus-scale data (every exchange below the
    join is either a broadcast or a single-partition shortlist)."""
    plan = _physical(qs["docs_hybrid_rrf"](spark, sf_dir))
    assert len(re.findall(r"TakeOrderedAndProject", plan)) >= 2
    # no corpus-keyed hash shuffle above the shortlists: the only
    # hashpartitioning exchanges allowed are the tiny tf/window ones
    # inside bm25 (key = w / doc_id on the filtered postings)
    assert "CartesianProduct" not in plan


def test_corpus_lm_stats_tokenize_once(spark, sf_dir, qs):
    """unigram_logprob and source_kl derive cf/totals from a CHECKPOINTED
    count table: the final plan must contain ZERO parquet scans (the one
    corpus tokenization ran inside the checkpoint job) and read the
    materialized RDD from every branch — without the checkpoint Spark
    re-tokenized the corpus once per join input (probed: 4× and 6×)."""
    for name in ("docs_unigram_logprob", "docs_source_kl"):
        plan = _physical(qs[name](spark, sf_dir))
        assert len(re.findall(r"Scan parquet|FileScan", plan)) == 0, name
        assert len(re.findall(r"Scan ExistingRDD", plan)) >= 2, name


def test_minhash_estimator_candidate_pairs_materialized(spark, sf_dir, qs):
    """The LSH candidate-pair table is referenced 3× (cand_ids union ×2 +
    output join): it must be checkpoint-materialized so the
    signature→banding pipeline runs once, not per reference."""
    plan = _physical(qs["docs_minhash_jaccard_estimate"](spark, sf_dir))
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 3


def test_anomaly_mad_stats_tables_materialized(spark, sf_dir, qs):
    """The per-type median/MAD tables are checkpoint-materialized: the
    events table appears at most twice in the final plan (its two
    inherent robust-stats passes), never once per downstream branch."""
    plan = _physical(qs["events_anomaly_mad"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet|FileScan", plan)) <= 2
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 2


def test_ngram_index_cached_single_evaluation(spark, sf_dir, qs):
    """The capped inverted index is persist()-cached and every consumer
    reads it from memory: the pair branch (kept buckets) and both
    dropped-bucket correction sides must be InMemoryTableScans, so the
    tokenize→shingle→groupBy pipeline executes once, not once per
    reference (probed uncached: 3 corpus scans, 9 shuffles). Since the
    r9 carried-sizes rewrite there is NO per-doc size table: sizes ride
    the posting-list members, and the only joins left are the two tiny
    correction LEFT joins onto the pair output."""
    plan = _physical(qs["docs_ngram_jaccard_pairs"](spark, sf_dir))
    mem = len(re.findall(r"InMemoryTableScan|TableCacheQueryStage", plan))
    scans = len(re.findall(r"Scan parquet|FileScan", plan))
    assert mem >= 3
    # every parquet-scan string sits inside a cached-subtree definition
    assert scans <= mem
    # r10: the duplicate-id union correction must NOT appear here — on a
    # unique-id corpus the eager probe (a separate tiny job, not part of
    # this plan) skips the fix joins entirely, so the main plan keeps the
    # pre-r10 shape: only the two df-cap correction LEFT joins
    assert len(re.findall(r"Join", plan)) <= 2


def test_remove_dup_chunks_one_scan_two_shuffles(spark, sf_dir, qs):
    """The C4-style rewrite is one narrow chunk+hash pass, one window over
    the chunk hash, one groupBy(doc) reassembly — 1 scan, 2 shuffles; the
    chunk text rides the hash shuffle by design (flags-only variants
    re-scan to re-attach text)."""
    plan = _physical(qs["docs_remove_dup_chunks"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet|FileScan", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_winnowing_is_pure_map_after_compute_spread(spark, sf_dir, qs):
    """Winnowing selects window-min fingerprints with per-doc array
    math: one scan, and the ONLY exchange is repartition_for_compute's
    spread of the single-partition local scan (a no-op at real scale) —
    no aggregation/join shuffle anywhere."""
    plan = _physical(qs["docs_winnowing"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet|FileScan", plan)) == 1
    assert len(re.findall(r"Exchange", plan)) <= 1


def test_winnowing_pairs_no_self_join(spark, sf_dir, qs):
    """Candidate pairs come from the bucket-group fan-out, not a
    fingerprint self-join: 1 scan, 2 semantic shuffles (posting groupBy,
    pair groupBy) plus at most the compute-spread repartition, ZERO join
    operators — the selection pipeline evaluates once."""
    plan = _physical(qs["docs_winnowing_pairs"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet|FileScan", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3
    assert len(re.findall(r"Join", plan)) == 0


def test_bigram_logprob_tokenizes_once(spark, sf_dir, qs):
    """The per-doc transition tf table is persist()-cached and unigram/
    bigram/prefix counts plus the scoring join all derive from it: every
    parquet-scan string in the plan sits inside a cached-subtree
    definition, so the corpus is tokenized exactly once (cache fill)."""
    plan = _physical(qs["docs_bigram_logprob"](spark, sf_dir))
    mem = len(re.findall(r"InMemoryTableScan|TableCacheQueryStage", plan))
    scans = len(re.findall(r"Scan parquet|FileScan", plan))
    assert mem >= 3
    # scan strings sit INSIDE cached-subtree definitions; when the shared
    # test session has already cached the same subtree, InMemoryRelations
    # nest and each ref prints its definition twice — bound, don't equate
    assert scans <= 2 * mem


def test_temperature_mixture_counts_cached_two_pass(spark, sf_dir, qs):
    """The O(langs) counts table is persist()-cached: the totals scalar,
    conf table, and final join all read the cache, so the corpus groupBy
    runs once and only the selection pass re-reads documents — the
    two-pass minimum for a data-derived-rate sampler (probed uncached:
    4 corpus scans)."""
    plan = _physical(qs["docs_temperature_mixture"](spark, sf_dir))
    assert len(re.findall(r"InMemoryTableScan|TableCacheQueryStage", plan)) >= 3
    # documents feeds the cache fill once + the selection pass once; the
    # remaining static scans in toString() are the cached subtree's own
    # definition repeated per InMemoryTableScan reference (not executed).
    # Nested re-caching in a shared session can double the printed
    # definitions, so bound rather than equate.
    mem = len(re.findall(r"InMemoryTableScan|TableCacheQueryStage", plan))
    scans = len(re.findall(r"Scan parquet|FileScan", plan))
    assert scans <= 2 * mem + 2


def test_ams_f2_aggregate_stays_lane_packed(spark, sf_dir, qs):
    """The AMS sketch aggregate keeps TWO 31-bit bit-counters per long
    (z_i = n − 2·ones_i recovered in the projection), so the sketch
    HashAggregate emits ~94 packed sums — under
    spark.sql.codegen.maxFields (default 100), where the naive
    depth·group=160 ±1-sum form falls out of whole-stage codegen and runs
    interpreted (measured 5.1 s vs 2.3 s per cold run at sf0.1). Pin the
    widest aggregate under that threshold so the regression can't
    silently return."""
    plan = _physical(qs["rel_ams_f2"](spark, sf_dir))
    max_fields = 0
    for m in re.finditer(r"HashAggregate\(keys=\[\], functions=\[(.*?)\]\)", plan):
        n = m.group(1).count("sum(") + m.group(1).count("count(")
        max_fields = max(max_fields, n)
    assert 0 < max_fields <= 100, f"widest global aggregate = {max_fields}"


def test_bottomk_quantiles_takeordered_never_global_sort(spark, sf_dir, qs):
    """The bottom-k sample selection must compile to TakeOrderedAndProject
    (per-partition top-k, k·P rows to the driver merge) — a global sort
    here would serialize the whole fact table through one partition. Two
    scans total: the sample build and the rank-evaluation pass."""
    plan = _physical(qs["rel_bottomk_quantiles"](spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") == 1
    assert not re.search(r"\bSort\b.*global=true", plan)
    assert len(re.findall(r"Scan parquet|FileScan", plan)) == 2


def test_cube_lineitem_expands_preaggregate_not_fact_rows(spark, sf_dir, qs):
    """The cube's ×4 Expand must consume the finest-grouping-set
    PRE-AGGREGATE (6 rows), never the fact table — a direct .cube() pushes
    every lineitem row through Expand before the partial aggregate (4× the
    fact table at 100 TB). Both measures are algebraic (count adds,
    fmean's fixed-point unit totals add), so the two-level fold is
    bit-identical. Pin: exactly one scan, and the Expand sits ABOVE a
    HashAggregate in the operator chain (aggregate output feeds Expand)."""
    plan = _physical(qs["rel_cube_lineitem"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1
    expand_at = plan.index("Expand")
    # the pre-aggregate's exchange (finest grouping keys, no grouping id)
    # must appear BELOW (later in the tree dump than) the Expand
    pre_agg_exchange = re.search(
        r"Exchange hashpartitioning\(l_returnflag#\d+, l_linestatus#\d+, \d+\)",
        plan,
    )
    assert pre_agg_exchange and pre_agg_exchange.start() > expand_at, (
        "Expand is not consuming the finest-grouping pre-aggregate"
    )


def test_substring_dedup_two_gram_exchanges_one_scan(spark, sf_dir, qs):
    """Exact substring dedup must stay at ONE corpus scan and exactly two
    gram-row exchanges — by gram hash (corpus-wide count via window, no
    second scan) and by doc (span merge) — with the final per-doc
    aggregate REUSING the doc partitioning (no third gram-row exchange
    between the doc window and the aggregate). The only other allowed
    exchange is repartition_for_compute's local-parallelism spread."""
    plan = _physical(qs["docs_substring_dedup"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning\(h#", plan)) == 1
    assert len(re.findall(r"Exchange", plan)) <= 3
    agg_at = plan.index("HashAggregate")
    win_at = plan.index("Window", agg_at)
    assert "Exchange" not in plan[agg_at:win_at]


def test_substring_rewrite_two_scans_no_pair_stage(spark, sf_dir, qs):
    """The span-removal rewrite needs the corpus twice (gram flags +
    token reconstruction) and must stay linear: exactly one gram-hash
    exchange for the corpus-wide count/argmin window, no cartesian or
    pair-generating join anywhere, and the k-fan-out resolves through
    hash exchanges only."""
    plan = _physical(qs["docs_substring_rewrite"](spark, sf_dir))
    assert len(re.findall(r"FileScan", plan)) == 2
    assert len(re.findall(r"Exchange hashpartitioning\(h#", plan)) == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_multimodal_rows_prune_to_id_and_push_bound(spark, sf_dir, qs):
    """r12: the three synthetic-asset rows derive everything from doc_id —
    the documents scan must prune to that single column and push the
    id bound into the parquet reader; reading `text` (or the full row)
    into the Arrow render stage would move corpus bytes into Python for
    no reason at any scale."""
    for name in ("mm_phash_near_dup", "mm_audio_near_dup", "mm_video_near_dup"):
        plan = _formatted(qs[name](spark, sf_dir))
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        doc_scans = [s for s in scans if "doc_id" in s]
        assert doc_scans, f"{name}: no documents scan found"
        for s in doc_scans:
            assert s.strip() == "doc_id:bigint", f"{name}: unpruned scan {s}"
        assert re.search(r"PushedFilters: \[[^\]]*LessThan\(doc_id,400\)", plan), (
            f"{name}: id bound not pushed")


def test_url_family_prunes_to_doc_id_single_shuffle(spark, sf_dir, qs):
    """r13 URL family: the synthetic-URL projection must reach the scan
    as a doc_id-only read (the text/lang/source payload never loads),
    url_dedup pays exactly ONE hash shuffle (the canonical-hash groupBy),
    and the blocklist/decontamination gates broadcast their small side —
    the corpus never shuffles for a membership test."""
    plan = _formatted(qs["docs_url_dedup"](spark, sf_dir))
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all(s == "struct<doc_id:bigint>" for s in schemas)
    phys = _physical(qs["docs_url_dedup"](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", phys)) == 1

    for name in ("docs_url_decontaminate", "docs_url_blocklist"):
        p = _physical(qs[name](spark, sf_dir))
        assert "BroadcastExchange" in p, name
        # the corpus side never hash-shuffles for the membership probe
        corpus_exchanges = len(re.findall(r"Exchange hashpartitioning", p))
        assert corpus_exchanges <= 1, (name, corpus_exchanges)
