"""Empirical scale-up probe: measure how the scale-critical operators
grow from sf0.01 → sf0.1 → a synthetic 10×-sf0.1 ("sf1x") replica set.

The question the probe answers with data instead of argument: does each
operator's runtime grow ~linearly in input size (the pure-map and
bucket-bounded plans), or does hidden quadratic structure leak in? A
plan-shape audit (PLAN_AUDIT.md) proves there is no cartesian/self-join;
this measures the constants actually realized on 32 cores.

Synthetic 10× construction (written under .scale_probe/, gitignored):
- documents: 10 replicas, doc_id offset by replica·1e6; every TOKEN gets a
  per-replica suffix (regexp '$1_r<i>') so replicas share no shingles —
  near-dup/candidate structure per replica matches the original corpus and
  the true output (pairs, buckets) scales exactly 10×. Naive replication
  would instead make every doc a 10-way near-duplicate family and blow the
  pair output up combinatorially — measuring output explosion, not engine
  scaling.
- embeddings: id offset per replica, vectors unchanged (ANN cost is
  matvec/scan-bound; duplicate vectors don't change the work).
- events: event_id/user_id offset per replica, timestamps unchanged —
  10× density per time window, the realistic direction of growth.
- lineitem/orders: all keys offset by replica·10^7 → ten disjoint copies
  of the trade graph (pagerank components scale linearly; join/agg
  cardinalities scale 10×).

Beyond the registry queries, a SYNTHETIC skewed-graph case probes
triangle counting directly: the engine's own co-trade graph is
degree-bounded by construction (mutual top-T), so it cannot exercise the
degree-descending orientation's reason to exist — a hub whose id-ordered
wedge fan-out would be O(d_max²). The synthetic graph gives hubs degree
~L/5 with leaves closing triangles through them, at two sizes 10× apart.

Usage: python scripts/scaling_probe.py [--skip-gen] [--round N]
Writes SCALING_r{N}.json at the repo root (default round 7).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SF1X = os.path.join(_HERE, ".scale_probe", "sf1x")
REPLICAS = 10

#: the probe set: every family whose 100 TB story depends on plan shape
PROBE = [
    "docs_winnowing",            # pure map (window-min fingerprints)
    "docs_token_stats",          # narrow text features
    "docs_minhash_lsh_pairs",    # band-bucket candidate generation
    "docs_simhash_near_pairs",   # pigeonhole hamming buckets
    "docs_bm25_topk",            # term-filtered postings retrieval
    "docs_exact_dedup",          # hash-groupBy
    "emb_cosine_topk",           # brute-force matvec baseline
    "emb_ivf_topk",              # cell-pruned ANN
    "rel_pagerank",              # iterative joins (10 disjoint components)
    "rel_supplier_value",        # fact join + exact-fold agg
    "stream_sessionize",         # gap sessionization over event time
    "events_cumulative_users",   # first-seen collapse + running total
    "weather_basic_stats",       # exact display-mean fold
    # r6 sketch family: constant-size summaries must stay scan-bound
    "rel_hll_distinct",          # register build (m rows out, any input)
    "rel_kmv_intersection",      # two k-minima sketches + merge
    "rel_bloom_semijoin",        # bit filter build + broadcast probe
    "rel_triangle_count",        # pair explode + two edge joins (the
                                 # quadratic-risk candidate of the family)
    "rel_ams_f2",                # lane-packed one-pass sign aggregate
                                 # (+ the exact per-key F2 it is judged
                                 # against — the latter owns the shuffle)
    # r7 additions: the remaining bench-heavy rows with no scaling row
    "docs_winnowing_pairs",      # posting-list pair fan-out + pair count
    "rel_bottomk_quantiles",     # KMV row-sample + rank evaluation
    "rel_cms_heavy_hitters",     # counter grid + candidate verify pass
    # r8: exact substring-run dedup — two token-count-sized exchanges
    # (gram hash, then doc); growth must track corpus size, not pairs
    "docs_substring_dedup",
    "docs_substring_rewrite",    # span removal: k-fan-out + rebuild
    "docs_substring_pairs",      # df-capped posting-list pair fan-out
    # r10: the maintained-index read paths (build 2 batches + read;
    # growth must track corpus, the view join must not re-scan history),
    # frozen-model scoring (pure scan). The fixed-k emb_semdedup row
    # swept here r10-r13 was REMOVED in r14 (r13 verdict #2): its k=4
    # oracle pin grows Σ block² ~ n² by parameter choice, so sweeping it
    # at sf0.1/sf1x measured a configuration no deployment would run —
    # emb_semdedup_scaledk below is the scale-posture series, and the
    # kernel-isolated growth stays visible via _semdedup_blocked_probe.
    "docs_minhash_pairs_indexed",
    "docs_substring_pairs_indexed",
    "docs_distill_score",
    # r13: the sqrt(n)-k SemDeDup row (r12 verdict #2) — with k scaling,
    # expected block size stays ~sqrt(n) and the within-block gemm must
    # grow ~linearly per decade, unlike the pinned-k row's n²; plus the
    # new URL family's dedup (canonical-hash shuffle, must track corpus)
    "emb_semdedup_scaledk",
    "docs_url_dedup",
    # r14 (r13 verdict #3): pagerank in its 100 TB posture — cached
    # co-partitioned share + per-iteration rank checkpoints; growth must
    # beat the default row's 3.67x/decade (the rebuild-per-iteration tax
    # is what that number was measuring)
    "rel_pagerank_copart",
]


def _gen(spark: SparkSession) -> None:
    shutil.rmtree(SF1X, ignore_errors=True)
    os.makedirs(SF1X, exist_ok=True)

    def reps():
        return list(range(REPLICAS))

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    out = None
    for i in reps():
        # replica 0 keeps the ORIGINAL text (and ids): term-anchored
        # queries (bm25, hybrid) must still find their query terms, and
        # the original near-dup structure must survive verbatim
        text = (
            F.col("text") if i == 0
            else F.regexp_replace(F.col("text"), r"(\S+)", f"$1_r{i}")
        )
        r = docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            text.alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        out = r if out is None else out.unionByName(r)
    out.write.mode("overwrite").parquet(f"{SF1X}/documents.parquet")

    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    id_col = "emb_id" if "emb_id" in embs.columns else embs.columns[0]
    out = None
    for i in reps():
        r = embs.withColumn(id_col, F.col(id_col) + F.lit(i * 1_000_000))
        out = r if out is None else out.unionByName(r)
    out.write.mode("overwrite").parquet(f"{SF1X}/embeddings.parquet")

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    out = None
    for i in reps():
        r = ev
        for c in ("event_id", "user_id"):
            if c in ev.columns:
                r = r.withColumn(c, F.col(c) + F.lit(i * 10_000_000))
        out = r if out is None else out.unionByName(r)
    out.write.mode("overwrite").parquet(f"{SF1X}/events.parquet")

    for tbl, keys in (
        ("lineitem", ("l_orderkey", "l_suppkey", "l_partkey")),
        ("orders", ("o_orderkey", "o_custkey")),
        ("customer", ("c_custkey", "c_nationkey")),
        ("supplier", ("s_suppkey", "s_nationkey")),
        ("part", ("p_partkey",)),
    ):
        t = spark.read.parquet(f"{SF01}/{tbl}.parquet")
        out = None
        for i in reps():
            r = t
            for c in keys:
                if c in t.columns and not c.endswith("nationkey"):
                    r = r.withColumn(c, F.col(c) + F.lit(i * 10_000_000))
            out = r if out is None else out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{SF1X}/{tbl}.parquet")

    # small dims unchanged
    for tbl in ("region", "nation"):
        spark.read.parquet(f"{SF01}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1X}/{tbl}.parquet")


def _median_noop(df_builder, runs: int = 3) -> float:
    from skylogix_real_time_weather_data_pipeline_spark.cache import (
        release_owned_caches,
    )

    def _run() -> float:
        df = df_builder()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
        # each build registers fresh owned persists (graph deg/oriented,
        # postings, ...); drain them per run like local_verify does, or
        # ~16 zombie cached frames per probe ride along and squeeze every
        # later timing (r7 advisor)
        release_owned_caches(df.sparkSession)
        return t

    _run()  # warm
    return statistics.median(_run() for _ in range(runs))


def _semdedup_blocked_probe(spark: SparkSession) -> dict:
    """SemDeDup block-kernel scaling at the operator's HONEST posture:
    the registry row pins k=4 clusters (the unrolled-Lloyd oracle
    constraint), so its Σ block² cost grows ~n² on 10x input — a
    parameter-choice artifact, not a kernel property. The paper scales
    cluster count with corpus size (k ~ n/const keeps blocks constant);
    this probe feeds hash-bucket labels with ~500-vector blocks at every
    scale through the SAME pruning kernel (semdedup(labels=...)), so the
    measured growth isolates the kernel: constant block size ⇒ linear in
    the number of blocks."""
    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.ext.similarity import (
        semdedup,
    )

    rec: dict = {}
    for label, sf in (("sf0.01", SF001), ("sf0.1", SF01), ("sf1x", SF1X)):
        embs = spark.read.parquet(f"{sf}/embeddings.parquet")
        n = embs.count()
        k = max(4, n // 500)
        labels = embs.select(
            "vec_id",
            F.pmod(F.xxhash64("vec_id"), F.lit(k)).cast("int").alias("cluster"),
        )
        t = _median_noop(lambda: semdedup(embs, threshold=0.35, labels=labels))
        rec[label] = {"n": n, "k": k, "sec": round(t, 3)}
    rec["growth_10x"] = round(
        rec["sf1x"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9), 2
    )
    return rec


def _skewed_triangle_probe(spark: SparkSession) -> dict:
    """Triangle counting on a hub-skewed graph at L and 10·L leaves.

    Construction: 10 hub vertices (ids 0..9, degree ~L/5 each — the ids
    an ID-ORDERED orientation would fan out on), all 45 hub-hub edges,
    and L leaves each tied to two distinct hubs — so every leaf closes
    exactly one triangle through its hub pair. Degree-descending
    orientation points leaf→hub and lower-degree-hub→higher, keeping
    per-vertex join fan-out bounded; the probe asserts the wall-clock
    growth for 10× leaves stays near-linear (<4 is the round gate).
    """
    from skylogix_real_time_weather_data_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    def edges(n_leaves: int):
        leaves = spark.range(n_leaves).select(
            (F.col("id") + 100).alias("leaf"),
            (F.col("id") % 10).alias("h1"),
            ((F.col("id") + 1) % 10).alias("h2"),
        )
        leaf_edges = leaves.select(F.col("h1").alias("a"), F.col("leaf").alias("b")).unionByName(
            leaves.select(F.col("h2").alias("a"), F.col("leaf").alias("b"))
        )
        hub_edges = spark.createDataFrame(
            [(i, j) for i in range(10) for j in range(i + 1, 10)], ["a", "b"]
        )
        return leaf_edges.unionByName(hub_edges)

    rec: dict[str, object] = {}
    sizes = {"L100k": 100_000, "L1m": 1_000_000}
    for label, n in sizes.items():
        t = _median_noop(lambda: triangle_stats(edges(n)))
        row = triangle_stats(edges(n)).collect()[0]
        from skylogix_real_time_weather_data_pipeline_spark.cache import (
            release_owned_caches,
        )

        release_owned_caches(spark)
        # each leaf closes one triangle through its hub pair; the 10
        # hubs' K10 clique adds C(10,3) = 120 hub-only triangles
        assert row.n_triangles == n + 120, row
        rec[label] = round(t, 3)
    rec["growth_10x"] = round(rec["L1m"] / max(rec["L100k"], 1e-9), 2)
    return rec


def _streaming_state_probe(spark: SparkSession) -> dict:
    """10× state growth for the stateful-streaming path under RocksDB
    (the engine's default provider): run the applyInPandasWithState
    running-stats operator over K and 10·K distinct keys (two
    micro-batches each, every batch touching every key), then read the
    final progress's state-operator metrics. The 100 TB question this
    answers with data: does per-batch latency track the BATCH size (good
    — RocksDB keeps state off-heap and updates are point writes) or the
    TOTAL state size (bad — a provider that rewrites its store per batch
    cannot hold 10⁹-key state)?"""
    import tempfile

    from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
        running_key_stats_bucketed,
        running_key_stats_perkey,
    )

    variants = {
        # per-key state: one Python call + one state put PER KEY per batch
        # (since r14 the EXPLICIT form — running_key_stats defaults to
        # the bucketed posture this probe certified)
        "perkey": running_key_stats_perkey,
        # r8: bucketed state (1024 buckets) — one vectorized Python call
        # + one array-blob put per TOUCHED BUCKET; same output contract
        "bucketed": lambda s, k, v: running_key_stats_bucketed(
            s, k, v, n_buckets=1024
        ),
    }
    rec: dict[str, object] = {}
    for label, nkeys in (("keys100k", 100_000), ("keys1m", 1_000_000)):
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "src")
            for b in range(2):
                (
                    spark.range(nkeys)
                    .select(
                        F.concat(F.lit("k"), F.col("id")).alias("k"),
                        (F.col("id") % 97).cast("double").alias("v"),
                    )
                    .coalesce(4)
                    .write.mode("append" if b else "overwrite").json(src)
                )
            for vlabel, op in variants.items():
                ckpt = os.path.join(td, f"ckpt_{vlabel}")
                stream = (
                    spark.readStream.schema("k string, v double")
                    .option("maxFilesPerTrigger", 4)
                    .json(src)
                )
                t0 = time.perf_counter()
                q = (
                    op(stream, "k", "v")
                    .writeStream.format("noop")
                    .outputMode("update")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(600)
                wall = time.perf_counter() - t0
                progresses = [p for p in q.recentProgress if p["stateOperators"]]
                last = progresses[-1]["stateOperators"][0]
                cm = last.get("customMetrics", {})
                rec[f"{label}_{vlabel}"] = {
                    "wall_s": round(wall, 2),
                    "n_batches": len(progresses),
                    "state_rows": last["numRowsTotal"],
                    "state_mem_bytes": last["memoryUsedBytes"],
                    "last_batch_update_ms": last["allUpdatesTimeMs"],
                    "last_batch_commit_ms": last["commitTimeMs"],
                    # rocksdbSstFileSize stays 0 at these state sizes (the
                    # memtable absorbs everything and changelog
                    # checkpointing defers snapshot flushes), so record the
                    # counters that DO move: point writes, bytes written,
                    # and the fsync part of the commit — the per-batch
                    # costs a 10⁹-key deployment pays.
                    "rocksdb_put_count": cm.get("rocksdbPutCount"),
                    "rocksdb_bytes_written": cm.get("rocksdbTotalBytesWritten"),
                    "rocksdb_commit_fsync_ms": cm.get(
                        "rocksdbCommitFileSyncLatencyMs"
                    ),
                }
    k1, k10 = rec["keys100k_perkey"], rec["keys1m_perkey"]
    rec["growth_10x_wall"] = round(k10["wall_s"] / max(k1["wall_s"], 1e-9), 2)
    rec["growth_10x_state_rows"] = round(
        k10["state_rows"] / max(k1["state_rows"], 1), 2
    )
    b1, b10 = rec["keys100k_bucketed"], rec["keys1m_bucketed"]
    rec["growth_10x_wall_bucketed"] = round(
        b10["wall_s"] / max(b1["wall_s"], 1e-9), 2
    )
    # the r7 verdict's target: >=3x update-throughput at 1M keys
    rec["bucketed_speedup_keys1m"] = round(
        k10["wall_s"] / max(b10["wall_s"], 1e-9), 2
    )
    return rec


def main() -> int:
    from skylogix_real_time_weather_data_pipeline_spark.session import ROCKSDB_PROVIDER

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-gen" not in sys.argv:
        t0 = time.time()
        _gen(spark)
        print(f"# generated 10x replica set in {time.time()-t0:.1f}s", file=sys.stderr)

    rnd0 = 7
    if "--round" in sys.argv:
        rnd0 = int(sys.argv[sys.argv.index("--round") + 1])
    path0 = os.path.join(_HERE, f"SCALING_r{rnd0:02d}.json")
    if "--state-only" in sys.argv:
        # patch just the streaming-state section of an existing round
        # file (the query probes are ~25 min; the state probe ~4)
        with open(path0) as fh:
            out = json.load(fh)
        out["streaming_state_rocksdb"] = _streaming_state_probe(spark)
        print(f"# streaming_state_rocksdb: {out['streaming_state_rocksdb']}",
              file=sys.stderr)
        with open(path0, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({"written": path0, "queries": len(out)}))
        return 0

    import __spark_entry__ as E

    qs = E.queries()
    out: dict[str, dict] = {}
    for name in PROBE:
        fn = qs[name]
        rec = {}
        for label, sf in (("sf0.01", SF001), ("sf0.1", SF01), ("sf1x", SF1X)):
            try:
                rec[label] = round(_median_noop(lambda: fn(spark, sf)), 3)
            except Exception as exc:  # noqa: BLE001
                rec[label] = f"ERROR {type(exc).__name__}: {exc}"[:120]
        if isinstance(rec.get("sf1x"), float) and isinstance(rec.get("sf0.1"), float):
            rec["growth_10x"] = round(rec["sf1x"] / max(rec["sf0.1"], 1e-9), 2)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
    out["emb_semdedup_blocked"] = _semdedup_blocked_probe(spark)
    print(f"# emb_semdedup_blocked: {out['emb_semdedup_blocked']}",
          file=sys.stderr)
    out["synthetic_skewed_triangles"] = _skewed_triangle_probe(spark)
    print(f"# synthetic_skewed_triangles: {out['synthetic_skewed_triangles']}",
          file=sys.stderr)
    out["streaming_state_rocksdb"] = _streaming_state_probe(spark)
    print(f"# streaming_state_rocksdb: {out['streaming_state_rocksdb']}",
          file=sys.stderr)
    rnd = 7
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    path = os.path.join(_HERE, f"SCALING_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": path, "queries": len(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
