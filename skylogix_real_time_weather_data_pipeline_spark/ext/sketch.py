"""Distributed sketch operators: KMV distinct + set algebra, HyperLogLog,
count-min heavy hitters, Bloom-filter semi-join pruning.

These are the mergeable-summary primitives a 100 TB pipeline leans on when
an exact answer is either unnecessary (cardinality estimates, heavy-hitter
shortlists) or unaffordable as a first pass (joining a fact table against a
selective dimension without shuffling the fact side). All follow the same
Spark shape: a map-side-combinable aggregate collapses the input to a
sketch whose size is a CONSTANT independent of input rows (k minima, m
registers, d·w counters, m bits), so the shuffle each one pays moves
kilobytes no matter how many terabytes were scanned — and each sketch is a
monoid (min-set union / register max / counter add / bit or), which is
what makes per-shard summaries combinable without re-scans.

Determinism pins: hashing is the repo-wide portable 60-bit md5
(``ext.dedup._md5_long``), and every estimate is derived with either pure
integer arithmetic (floor divisions on decimal(38,0)/HUGEINT) or doubles
whose bit pattern is provably identical cross-engine, so a DuckDB oracle
replays each sketch bit-for-bit — these "approximate" operators are
approximate w.r.t. the truth, never w.r.t. the oracle.

Public provenance: KMV is the k-minimum-values estimator of Bar-Yossef et
al. (RANDOM 2002) as refined by Beyer et al. (SIGMOD 2007, the (k-1)/h_(k)
unbiased form), with the set-algebra extension of the theta sketch
(Dasgupta et al., 2016); HyperLogLog is Flajolet-Fusy-Gandouet-Meunier
(AofA 2007); count-min is Cormode & Muthukrishnan (J. Algorithms 2005);
Bloom-filter join pruning is the classic semi-join reduction (Bloom, CACM
1970) that Spark itself ships as runtime row-group filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _md5_long

#: hash space of ext.dedup._md5_long: 15 hex chars = 60 uniform bits
HASH_BITS = 60


def kmv_mins(df: DataFrame, key_col: str, k: int = 256,
             seed: int = 0) -> DataFrame:
    """The KMV sketch itself: the k smallest distinct 60-bit hashes of
    ``key_col`` as a (h) frame — the per-shard/per-batch summary that
    :func:`kmv_merge` combines and :func:`kmv_estimate_from_mins` reads."""
    return (
        df.select(_md5_long(F.col(key_col).cast("string"), seed).alias("h"))
        .distinct()
        .sort("h")
        .limit(k)
    )


def kmv_merge(state: DataFrame | None, delta: DataFrame, k: int) -> DataFrame:
    """Monoid combine of two k-minima frames: union → distinct → re-take k.
    Associative and commutative, so shards/batches merge in any order."""
    if state is None:
        return delta
    return state.unionByName(delta).distinct().sort("h").limit(k)


def kmv_estimate_from_mins(mins: DataFrame, k: int) -> DataFrame:
    """ONE row (kept, hk, kmv_estimate) from a stored k-minima sketch —
    the read path shared by the one-shot operator and the incremental
    view (streaming/matview.py)."""
    num = (k - 1) * (1 << HASH_BITS)
    sk = mins.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("long").alias("kept")
    )
    est = (
        F.when(F.col("kept") < k, F.col("kept"))
        .otherwise(
            F.expr(f"CAST(floor(CAST({num} AS DECIMAL(38,0)) / hk) AS BIGINT)")
        )
        .cast("long")
    )
    return sk.select("kept", "hk", est.alias("kmv_estimate"))


def kmv_distinct(df: DataFrame, key_col: str, k: int = 256,
                 seed: int = 0) -> DataFrame:
    """K-minimum-values distinct-count sketch over ``key_col``; returns ONE
    row (k, kept, hk, kmv_estimate, exact_distinct, err_ppm).

    Estimator: hash every key into the uniform 60-bit space, keep the k
    smallest DISTINCT hashes; the k-th smallest h_(k) divides the space into
    k-1 average gaps, so distinct ≈ (k-1)·2^60 / h_(k) (Beyer et al.'s
    unbiased form). When fewer than k distinct hashes exist the sketch IS
    the exact distinct set and the estimate is its size.

    Spark shape: the distinct() is one shuffle sized by DISTINCT keys (not
    input rows), then ``sort().limit(k)`` compiles to TakeOrderedAndProject
    — each partition keeps its own k minima and the driver merges k·P longs.
    The sketch is trivially mergeable (union the minima, re-take k), which
    is what makes it a per-shard summary at 100 TB. The exact_distinct
    eval column costs a second single-column scan + count_distinct shuffle
    — the expensive exact pass the sketch exists to replace; a production
    caller at scale reports the estimate alone and drops that branch.

    Integer exactness: (k-1)·2^60 exceeds int64, so the quotient is
    computed as floor(decimal(38,0) / hk). Spark's decimal division
    carries ≥21 fractional digits while the true quotient's fractional
    part is a multiple of 1/h_k > 8e-19, so the HALF_UP at the division
    scale can never cross an integer boundary — floor() matches DuckDB's
    HUGEINT ``//`` exactly (probe-verified).
    """
    sk = kmv_estimate_from_mins(kmv_mins(df, key_col, k, seed), k)
    exact = df.agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    # 1-row scalar combine (bnlj-scalar: broadcast nested loop of two
    # single-row aggregates, no real cartesian)
    return (
        sk.crossJoin(F.broadcast(exact))
        .select(
            F.lit(k).alias("k"),
            "kept",
            "hk",
            "kmv_estimate",
            "exact_distinct",
        )
        # integer ppm: long DIV long (floor on non-negatives) — a double
        # `/` here would reintroduce the float path the sketch avoids
        .withColumn(
            "err_ppm",
            F.expr(
                "(abs(kmv_estimate - exact_distinct) * CAST(1000000 AS BIGINT))"
                " DIV exact_distinct"
            ),
        )
    )


def cms_heavy_hitters(df: DataFrame, key_col: str, depth: int = 3,
                      width: int = 256, top_n: int = 10) -> DataFrame:
    """Count-min-sketch frequency estimates for the exact top-``top_n``
    keys: (key, exact_count, cms_count, overestimate) — cms_count ≥
    exact_count always (one-sided error), and the overestimate column
    measures the collision noise at this depth×width.

    Sketch: ``depth`` independent hash rows of ``width`` counters; a key's
    estimate is the MIN of its counters across rows (each row overcounts by
    whatever collides into the same bucket; the min takes the least-noisy
    row). Updates are pure increments, so the whole sketch is one
    map-side-combinable groupBy(row, bucket) — d·w counter rows total,
    CONSTANT in input size; that is the entire point at 100 TB, where a
    per-key exact groupBy may be unaffordable as a first pass.

    This eval variant aggregates per-key counts once (one shuffle, also
    feeding the exact top-N shortlist the estimates are judged against)
    and derives the sketch from those counts — identical counters to a
    direct streaming build, which would simply sum 1s from the raw rows
    through the same (row, bucket) aggregate without ever materializing
    per-key state.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    key_str = F.col("key").cast("string")
    bucket_rows = counts.select(
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (_md5_long(key_str, d) % width).alias("b"),
                    )
                    for d in range(1, depth + 1)
                ]
            )
        ).alias("db"),
    )
    sketch = (
        bucket_rows.groupBy(
            F.col("db.d").alias("d"), F.col("db.b").alias("b")
        )
        .agg(F.sum("exact_count").alias("bucket_count"))
    )
    top = counts.sort(
        F.desc("exact_count"), F.asc("key")
    ).limit(top_n)
    probes = top.select(
        "key",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (_md5_long(key_str, d) % width).alias("b"),
                    )
                    for d in range(1, depth + 1)
                ]
            )
        ).alias("db"),
    ).select("key", "exact_count", F.col("db.d").alias("d"), F.col("db.b").alias("b"))
    # the sketch is d·w rows — broadcast it; the probe side is top_n·d rows
    est = (
        probes.join(F.broadcast(sketch), ["d", "b"])
        .groupBy("key", "exact_count")
        .agg(F.min("bucket_count").alias("cms_count"))
    )
    return est.select(
        "key",
        "exact_count",
        "cms_count",
        (F.col("cms_count") - F.col("exact_count")).alias("overestimate"),
    )


def cms_counters(df: DataFrame, key_col: str, depth: int = 3,
                 width: int = 256) -> DataFrame:
    """(d, b, bucket_count) counter delta straight from raw rows — the
    direct streaming build: one map-side-combinable aggregate, d·w rows
    out, no per-key state ever materialized. :func:`cms_merge` adds
    deltas; point estimates read MIN over the d rows of a key's buckets
    (see :func:`cms_heavy_hitters`, whose counters this matches exactly)."""
    key_str = F.col(key_col).cast("string")
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            (_md5_long(key_str, d) % width).alias("b"),
                        )
                        for d in range(1, depth + 1)
                    ]
                )
            ).alias("db")
        )
        .groupBy(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_count"))
    )


def cms_merge(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Monoid combine of counter frames: per-(d,b) ADD. Additive — each
    input row must reach exactly one delta (the replay guard in
    streaming/matview.py enforces that under at-least-once delivery)."""
    if state is None:
        return delta
    st = state.select("d", "b", F.col("bucket_count").alias("_c"))
    return st.join(delta, ["d", "b"], "full_outer").select(
        "d",
        "b",
        (
            F.coalesce(F.col("_c"), F.lit(0))
            + F.coalesce(F.col("bucket_count"), F.lit(0))
        ).cast("long").alias("bucket_count"),
    )


def bloom_semijoin_stats(build: DataFrame, build_key: str, probe: DataFrame,
                         probe_key: str, m_bits: int = 4096, n_hashes: int = 3,
                         ) -> DataFrame:
    """Bloom-filter semi-join reduction with a measured false-positive rate;
    returns ONE row (m_bits, n_hashes, n_build_distinct, n_probe,
    bloom_pass, true_members, false_positives, fp_rate_ppm).

    The production shape this demonstrates: to semi-join a huge probe side
    against a selective build side, build an ``m_bits`` Bloom filter over
    the build keys — a groupBy(block) bit_or that map-side-combines to
    m_bits/32 rows regardless of build size — broadcast it, and pre-filter
    the probe side with ``n_hashes`` bit tests BEFORE any shuffle. Only
    bloom survivors reach the exact semi-join, so the shuffled volume drops
    by the filter's selectivity. Spark's own runtime row-group filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) does exactly this
    inside the optimizer; this operator is the explicit, oracle-checkable
    form with the fp-rate made visible.

    Bit layout: positions are the portable 60-bit md5 mod m_bits; 32-bit
    blocks (mask = 1 << (pos % 32)) keep every block value strictly
    positive, so the bit_or/bit-test arithmetic is sign-free and identical
    in Spark longs and DuckDB BIGINTs.
    """
    n_blocks = m_bits // 32
    bkeys = build.select(F.col(build_key).cast("long").alias("bk")).distinct()
    bkey_str = F.col("bk").cast("string")

    def positions(key_expr):
        return F.array(
            *[(_md5_long(key_expr, d) % m_bits).alias(f"p{d}")
              for d in range(1, n_hashes + 1)]
        )

    bloom = (
        bkeys.select(F.explode(positions(bkey_str)).alias("pos"))
        .select(
            F.expr("pos DIV 32").alias("block"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy("block")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    pkeys = probe.select(F.col(probe_key).cast("long").alias("pk"))
    pk_str = F.col("pk").cast("string")
    probe_pos = pkeys.select(
        "pk", F.explode(positions(pk_str)).alias("pos")
    ).select(
        "pk",
        F.expr("pos DIV 32").alias("block"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
    )
    # bloom is <= m_bits/32 rows: always broadcast — the probe side never
    # shuffles for the membership test
    hits = (
        probe_pos.join(F.broadcast(bloom), "block", "left")
        .select(
            "pk",
            # SQL `&` — PySpark's Column `&` operator is logical AND
            F.expr(
                "CASE WHEN bits IS NOT NULL AND (bits & mask) != 0"
                " THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
        .groupBy("pk")
        # min, not sum==n_hashes: a probe key delivered twice contributes
        # 2·n_hashes position rows, and a sum test would false-negative
        # every duplicated member (caught by the hypothesis membership
        # model); min(hit)==1 ⇔ every position row hit, at any multiplicity
        .agg(F.min("hit").alias("allhit"))
        .select("pk", (F.col("allhit") == 1).cast("int").alias("pass"))
    )
    truth = hits.join(
        F.broadcast(bkeys.select(F.col("bk").alias("pk"), F.lit(1).alias("member"))),
        "pk",
        "left",
    ).select("pk", "pass", F.coalesce(F.col("member"), F.lit(0)).alias("member"))
    agg = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum("pass").cast("long").alias("bloom_pass"),
        F.sum("member").cast("long").alias("true_members"),
        F.sum(
            F.when((F.col("pass") == 1) & (F.col("member") == 0), 1).otherwise(0)
        ).cast("long").alias("false_positives"),
    )
    nb = bkeys.agg(F.count(F.lit(1)).cast("long").alias("n_build_distinct"))
    return agg.crossJoin(F.broadcast(nb)).select(
        F.lit(m_bits).alias("m_bits"),
        F.lit(n_hashes).alias("n_hashes"),
        "n_build_distinct",
        "n_probe",
        "bloom_pass",
        "true_members",
        "false_positives",
        # fp rate over the true negatives the filter was asked to reject;
        # long DIV long keeps the ppm on the integer grid
        F.expr(
            "(false_positives * CAST(1000000 AS BIGINT))"
            " DIV greatest(n_probe - true_members, CAST(1 AS BIGINT))"
        ).alias("fp_rate_ppm"),
    )


def hll_registers(df: DataFrame, key_col: str, p: int = 8,
                  seed: int = 0) -> DataFrame:
    """The HLL sketch itself: occupied (bucket, rho) registers of
    ``key_col`` — at most 2^p rows from any input. :func:`hll_merge`
    max-combines them; :func:`hll_estimate_from_registers` reads them."""
    q = HASH_BITS - p
    rho_max = q + 1
    h = df.select(_md5_long(F.col(key_col).cast("string"), seed).alias("h"))
    return (
        h.select(
            F.expr(f"h DIV {1 << q}").alias("bucket"),
            F.expr(
                f"CASE WHEN h % {1 << q} = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(bin(h % {1 << q})) END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Monoid combine of register frames: per-bucket max. Associative,
    commutative, idempotent — re-merging the same registers is harmless
    (unlike additive sketches), the strongest replay posture of the
    family."""
    if state is None:
        return delta
    return (
        state.unionByName(delta).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )


def _hll_alpha_expr(m: int, rho_max: int) -> str:
    # e0 suffixes force DOUBLE literals in BOTH engines (a bare 0.7213
    # parses as DECIMAL in Spark SQL and DuckDB alike, whose division
    # rules then differ — doubles are IEEE-identical)
    return f"(0.7213e0 / (1.0e0 + 1.079e0 / {m}e0)) * {m * m}e0 * {1 << rho_max}e0"


def hll_estimate_from_registers(regs: DataFrame, p: int = 8) -> DataFrame:
    """ONE row (m, v_zero, s2, hll_estimate) from stored registers — the
    read path shared by the one-shot operator and the incremental view."""
    m = 1 << p
    rho_max = HASH_BITS - p + 1
    spark = regs.sparkSession
    all_regs = (
        spark.range(m).select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select(F.coalesce("rho", F.lit(0)).alias("M"))
    )
    alpha_expr = _hll_alpha_expr(m, rho_max)
    state = all_regs.agg(
        F.expr(
            f"sum(shiftleft(CAST(1 AS BIGINT), CAST({rho_max} - M AS INT)))"
        ).alias("s2"),
        F.sum(F.when(F.col("M") == 0, 1).otherwise(0)).cast("long").alias("v_zero"),
    )
    return state.select(
        F.lit(m).alias("m"),
        "v_zero",
        "s2",
        F.expr(
            f"CASE WHEN ({alpha_expr} / CAST(s2 AS DOUBLE)) <= 2.5e0 * {m}e0"
            f"          AND v_zero > 0"
            f" THEN CAST(round({m}e0 * ln({m}e0 / CAST(v_zero AS DOUBLE))) AS BIGINT)"
            f" ELSE CAST(round({alpha_expr} / CAST(s2 AS DOUBLE)) AS BIGINT)"
            f" END"
        ).alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, key_col: str, p: int = 8,
                 seed: int = 0) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) with
    m = 2^p registers, fully oracle-replayable; returns ONE row
    (m, v_zero, s2, hll_estimate, exact_distinct, err_ppm).

    Register build on the portable 60-bit hash: bucket = top p bits,
    rho = leading-zero count of the (60-p)-bit suffix + 1, computed
    EXACTLY in both engines as ``(60-p) + 1 - length(bin(w))`` (bin() —
    binary-digit string — exists with identical semantics in Spark and
    DuckDB; w=0 pins rho to the max). The register table is a
    groupBy(bucket).max(rho) — m rows, map-side-combinable, mergeable by
    max(): the canonical per-shard cardinality summary at 100 TB (Spark's
    own approx_count_distinct is this sketch; this form's hash is
    replayable in ANSI SQL, which that one's is not).

    Estimate arithmetic, pinned cross-engine:
    - s2 = Σ 2^((60-p)+1 − M_j) over ALL m registers (empty → M=0) — an
      EXACT long (max m·2^53 = 2^61 at p=8), the hash-checkable core of
      the sketch state;
    - raw = α_m·m²·2^((60-p)+1) / s2 with α_m = 0.7213/(1+1.079/m): every
      literal parses to the same IEEE double in both engines and the
      long→double cast of s2 rounds identically, so ``raw`` is the SAME
      double bit pattern in Spark and DuckDB;
    - small-range branch (raw ≤ 2.5m and zero registers exist): linear
      counting m·ln(m/v_zero). The single ROUND on these transcendental
      doubles is the only float→int step; a cross-libm 1-ulp ln()
      difference could flip it only at an exact .5 boundary — measure-zero
      on transcendental values (same argument as the pagerank contribution
      rounding). No large-range correction: at 60 hash bits collisions are
      negligible far beyond any real cardinality.
    """
    est = hll_estimate_from_registers(hll_registers(df, key_col, p, seed), p)
    exact = df.agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .withColumn(
            "err_ppm",
            F.expr(
                "(abs(hll_estimate - exact_distinct) * CAST(1000000 AS BIGINT))"
                " DIV exact_distinct"
            ),
        )
    )


def kmv_set_relations(df_a: DataFrame, key_a: str, df_b: DataFrame,
                      key_b: str, k: int = 256, seed: int = 0) -> DataFrame:
    """Set-algebra on KMV sketches (the theta-sketch idea, Dasgupta et al.):
    estimate |A∪B| and |A∩B| from the two k-minima sets alone; returns ONE
    row (k, union_kept, est_union, exact_union, est_intersection,
    exact_intersection, err_union_ppm, err_intersection_ppm).

    The union sketch is the k smallest of minsA ∪ minsB (KMV is a monoid —
    this IS how per-shard sketches merge at 100 TB, no re-scan of either
    input). Intersection: among the union's kept minima, the fraction
    present in BOTH input sketches is an unbiased Jaccard-on-sample, so
    est_inter = |common| · est_union // kept. When both sets are smaller
    than k the sketches are the exact hash sets and both estimates
    collapse to the exact values.

    The two k-minima frames are localCheckpointed: they are the stored
    sketch state (k longs each — in production these live in a summary
    table, not recomputed per set-operation), and the union + two
    membership probes would otherwise re-run each input's scan three
    times.
    """
    num = (k - 1) * (1 << HASH_BITS)

    def mins(df, key):
        return kmv_mins(df, key, k, seed).localCheckpoint()

    mins_a, mins_b = mins(df_a, key_a), mins(df_b, key_b)
    union_mins = (
        mins_a.unionByName(mins_b).distinct().sort("h").limit(k)
    )
    common = (
        union_mins.join(mins_a, "h", "left_semi")
        .join(mins_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    usk = union_mins.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("long").alias("union_kept")
    )
    a_keys = df_a.select(F.col(key_a).alias("key"))
    b_keys = df_b.select(F.col(key_b).alias("key"))
    exact_u = (
        a_keys.unionByName(b_keys)
        .agg(F.count_distinct("key").alias("exact_union"))
    )
    exact_i = (
        a_keys.distinct()
        .join(b_keys.distinct(), "key", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    est_union = (
        F.when(F.col("union_kept") < k, F.col("union_kept"))
        .otherwise(
            F.expr(f"CAST(floor(CAST({num} AS DECIMAL(38,0)) / hk) AS BIGINT)")
        )
        .cast("long")
    )
    return (
        usk.crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(exact_u))
        .crossJoin(F.broadcast(exact_i))
        .select(
            F.lit(k).alias("k"),
            "union_kept",
            est_union.alias("est_union"),
            "exact_union",
            F.expr("n_common").alias("n_common"),
            "exact_intersection",
        )
        .withColumn(
            # greatest(…, 1): two EMPTY inputs give union_kept = 0 (and
            # n_common = 0, so the estimate is still the exact 0) — the
            # guard keeps the degenerate case a 0, not a NULL (or a
            # division-by-zero error in the DuckDB oracle replay)
            "est_intersection",
            F.expr(
                "(n_common * est_union)"
                " DIV greatest(union_kept, CAST(1 AS BIGINT))"
            ),
        )
        .withColumn(
            "err_union_ppm",
            F.expr(
                "(abs(est_union - exact_union) * CAST(1000000 AS BIGINT))"
                " DIV greatest(exact_union, CAST(1 AS BIGINT))"
            ),
        )
        .withColumn(
            "err_intersection_ppm",
            F.expr(
                "(abs(est_intersection - exact_intersection)"
                " * CAST(1000000 AS BIGINT))"
                " DIV greatest(exact_intersection, CAST(1 AS BIGINT))"
            ),
        )
    )


def priority_sample_subset_sums(df: DataFrame, id_col: str, weight_col: str,
                                group_col: str, k: int = 256,
                                seed: int = 0) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): ONE stored
    k-item weighted sample answers ANY posterior subset-sum query with
    Σ max(w_i, τ) over the sample's subset members. Returns per-group
    (group, n_sampled, est_sum, exact_sum, err_ppm) — the groups play the
    role of arbitrary subsets the sample was NOT built for.

    Priorities are pure integers: q_i = w_i·2^60 div max(h_i, w_i) (h the
    portable 60-bit hash of the item id, standing in for the uniform draw
    u_i = h_i/2^60; the max() clamp bounds q ≤ 2^60 so the div stays in
    int64 — it only touches items with u_i < w_i/2^60 ≈ certain picks).
    Sample = the k largest priorities (ties broken by id), τ = the
    (k+1)-th priority in the SAME weight units, estimate per sampled item
    = max(w_i, τ). With n ≤ k the sample is everything, τ = 0, and every
    estimate is exact. The published estimator is unbiased with
    near-optimal subset-sum variance; floored priorities quantize u to
    the 2^-60 grid (bias far below the measured err), and the fixed hash
    makes sample membership, τ, and every estimate DETERMINISTIC — the
    oracle replays them bit-for-bit (Spark's decimal `div` == DuckDB
    HUGEINT `//`, probe-verified).

    Spark shape: priorities are a narrow map; the k+1 selection is
    sort().limit() → TakeOrderedAndProject (per-partition top-k, driver
    merges k·P rows); estimates are one groupBy over k rows joined to a
    broadcast τ scalar. The exact sums are the eval-only second scan. At
    100 TB the sample (k rows) lives in a summary table and subset
    queries never touch the fact table again — that is the operator's
    entire point.
    """
    items = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("w"),
        F.col(group_col).alias("grp"),
        _md5_long(F.col(id_col).cast("string"), seed).alias("h"),
    ).withColumn(
        "q",
        F.expr(
            f"(CAST(w AS DECIMAL(19,0)) * CAST({1 << HASH_BITS} AS DECIMAL(19,0)))"
            " div greatest(h, w)"
        ),
    )
    topk1 = (
        items.sort(F.desc("q"), F.asc("id"))
        .limit(k + 1)
        # the sample IS the stored sketch; two consumers (τ scalar +
        # sample rows) must not re-run the selection scan
        .localCheckpoint()
    )
    ranked = topk1.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("q"), F.asc("id"))),
    )
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("q"))), F.lit(0)
        ).cast("long").alias("tau")
    )
    sample = ranked.filter(F.col("rn") <= k)
    est = (
        sample.crossJoin(F.broadcast(tau))
        .select("grp", F.greatest(F.col("w"), F.col("tau")).alias("we"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.sum("we").cast("long").alias("est_sum"),
        )
        # fresh attribute id: both aggregates descend from `items`, and
        # Spark cannot auto-dedup the shared refs when the source is not
        # a re-aliasable relation (e.g. createDataFrame input)
        .withColumnRenamed("grp", "grp_s")
    )
    exact = items.groupBy("grp").agg(
        F.sum("w").cast("long").alias("exact_sum")
    )
    return (
        exact.join(est, exact["grp"] == est["grp_s"], "left")
        .select(
            F.col("grp").alias(group_col),
            F.coalesce("n_sampled", F.lit(0).cast("long")).alias("n_sampled"),
            F.coalesce("est_sum", F.lit(0).cast("long")).alias("est_sum"),
            "exact_sum",
        )
        .withColumn(
            "err_ppm",
            F.expr(
                "(abs(est_sum - exact_sum) * CAST(1000000 AS BIGINT))"
                " DIV greatest(exact_sum, CAST(1 AS BIGINT))"
            ),
        )
    )


def ams_f2(df: DataFrame, key_col: str, depth: int = 5, group: int = 32,
           seed: int = 100) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy, STOC'96)
    in the standard median-of-means form: estimate F2 = Σ f_x² — the
    self-join size / repeat rate of ``key_col`` — from depth·group
    ±1-signed counters; returns ONE row (depth, group, ams_estimate,
    exact_f2, err_ppm).

    Each counter keeps z = Σ_rows s(x) for a hash-derived sign s(x) ∈
    {−1,+1}; E[z²] = F2 with Var ≈ 2F2², so each output row AVERAGES
    ``group`` independent z² (Var/group) and the estimate is the MEDIAN
    over ``depth`` rows — the textbook (ε,δ) shape. The whole sketch is
    still ONE aggregate emitting depth·group longs — no explode, no
    per-key state, map-side-combined from any input (F2 is what a
    cost-based optimizer wants for join-size estimation; the additive
    counters are the streaming/mergeable form).

    Sign economy: counter i draws its sign from BIT (i mod 54) of the
    54-bit-truncated portable hash h_(i div 54) — 160 independent signs
    cost ceil(160/54) = 3 md5s per row instead of 160 (the bits of a
    cryptographic hash are pairwise independent; same device as the
    Carter-Wegman MinHash family). shiftright/& extraction is identical
    in Spark and DuckDB.

    Counter economy (lane packing): a ±1 counter is an affine function of
    a BIT counter — z_i = n − 2·ones_i — and bit counters pack two per
    long: sum((h >> o) & (1 | 1<<31)) accumulates ones_o in bits 0..30
    and ones_(o+31) in bits 31..62 with no carry between lanes while
    n < 2³¹. So the aggregate keeps ceil(54/2)·n_hashes + 1 packed sums
    instead of depth·group sign sums (94 vs 161 for the defaults) and
    each is a shift-mask-add instead of a branchy ±1 — measured 5.1 s →
    2.3 s per cold run at sf0.1 (the 161-sum form also exceeded
    spark.sql.codegen.maxFields and ran interpreted). The unpacked z's
    are recovered exactly in the result projection, so the estimate is
    BIT-IDENTICAL to the unpacked form and the oracle replays the
    textbook per-sign definition unchanged. The n < 2³¹ lane bound never
    binds: the z² group-sum int64 bound (rows ≤ √(2⁶³/group) ≈ 5.4e8
    for group=32) is tighter.

    Integer exactness: every z is an exact long (|z| ≤ rows), z² ≤ rows²,
    a group sum ≤ group·rows² (int64-safe to ~10⁸ rows per slice); the
    median of ``depth`` group-sums is an array_sort index and the final
    ams_estimate = median DIV group stays on the integer grid. The exact
    F2 rides along from a per-key count pass (eval-only — the expensive
    aggregation the sketch replaces).
    """
    n_signs = depth * group
    n_hashes = (n_signs + 53) // 54
    lane = 31  # lane width: two 31-bit bit-counters per packed long
    key_str = F.col(key_col).cast("string")
    hashed = df.select(
        *[
            _md5_long(key_str, seed + k).alias(f"h{k}")
            for k in range(n_hashes)
        ]
    )

    def used(k: int, b: int) -> bool:
        return b < 54 and k * 54 + b < n_signs

    packed = [F.expr("CAST(count(1) AS BIGINT)").alias("n")]
    for k in range(n_hashes):
        for o in range(lane):
            if not used(k, o) and not used(k, o + lane):
                continue
            mask = (1 | (1 << lane)) if used(k, o + lane) else 1
            packed.append(
                F.expr(f"CAST(sum((h{k} >> {o}) & {mask}) AS BIGINT)")
                .alias(f"s{k}_{o}")
            )
    sums = hashed.agg(*packed)

    def z_expr(i: int) -> str:
        k, b = i // 54, i % 54
        if b < lane:
            ones = f"(s{k}_{b} & {(1 << lane) - 1})"
        else:
            # NB: the infix `>>` fails to PARSE inside array(...) args
            # (Spark 4 grammar quirk); the function form always works
            ones = f"shiftright(s{k}_{b - lane}, {lane})"
        return f"(n - 2 * {ones})"

    row_sums = [
        " + ".join(
            f"{z_expr(d * group + g)} * {z_expr(d * group + g)}"
            for g in range(group)
        )
        for d in range(depth)
    ]
    est = sums.select(
        F.expr(
            f"array_sort(array({', '.join(row_sums)}))[{depth // 2}]"
            f" DIV CAST({group} AS BIGINT)"
        ).alias("ams_estimate")
    )
    exact = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(F.sum(F.expr("f * f")).cast("long").alias("exact_f2"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.lit(depth).alias("depth"),
            F.lit(group).alias("group"),
            "ams_estimate",
            "exact_f2",
            F.expr(
                "(abs(ams_estimate - exact_f2) * CAST(1000000 AS BIGINT))"
                " DIV greatest(exact_f2, CAST(1 AS BIGINT))"
            ).alias("err_ppm"),
        )
    )


def hll_registers_grouped(df: DataFrame, key_col: str, group_cols: list[str],
                          p: int = 8, seed: int = 0) -> DataFrame:
    """Per-group HLL registers: (group_cols..., bucket, rho) — at most 2^p
    rows per group. The grouped form of :func:`hll_registers`; merge
    across groups (e.g. time windows) is still per-bucket max."""
    q = HASH_BITS - p
    rho_max = q + 1
    h = df.select(
        *[F.col(c) for c in group_cols],
        _md5_long(F.col(key_col).cast("string"), seed).alias("h"),
    )
    return (
        h.select(
            *group_cols,
            F.expr(f"h DIV {1 << q}").alias("bucket"),
            F.expr(
                f"CASE WHEN h % {1 << q} = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(bin(h % {1 << q})) END"
            ).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_grouped(regs: DataFrame, group_cols: list[str],
                         p: int = 8) -> DataFrame:
    """Per-group (group_cols..., v_zero, s2, hll_estimate) from grouped
    registers, WITHOUT generating the m-bucket grid per group: present
    registers always have rho ≥ 1, so the closed form
    ``s2 = Σ_present 2^(rho_max − rho) + (m − n_present)·2^rho_max``
    folds the empty buckets in algebraically — one aggregate per group,
    no range/grid join, which is what lets the sketch estimate run per
    DAY (or per any high-cardinality group) at 100 TB."""
    m = 1 << p
    rho_max = HASH_BITS - p + 1
    alpha_expr = _hll_alpha_expr(m, rho_max)
    state = regs.groupBy(*group_cols).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("v_zero"),
        F.expr(
            f"CAST(sum(shiftleft(CAST(1 AS BIGINT), CAST({rho_max} - rho AS INT)))"
            f" + ({m} - count(1)) * CAST({1 << rho_max} AS BIGINT) AS BIGINT)"
        ).alias("s2"),
    )
    return state.select(
        *group_cols,
        "v_zero",
        "s2",
        F.expr(
            f"CASE WHEN ({alpha_expr} / CAST(s2 AS DOUBLE)) <= 2.5e0 * {m}e0"
            f"          AND v_zero > 0"
            f" THEN CAST(round({m}e0 * ln({m}e0 / CAST(v_zero AS DOUBLE))) AS BIGINT)"
            f" ELSE CAST(round({alpha_expr} / CAST(s2 AS DOUBLE)) AS BIGINT)"
            f" END"
        ).alias("hll_estimate"),
    )


def bottomk_rows(df: DataFrame, key_col, value_col: str, k: int = 256,
                 seed: int = 0) -> DataFrame:
    """The bottom-k row sample itself: the k (h, v) rows with the smallest
    (60-bit portable hash of ``key_col``, value) — the per-shard/per-batch
    summary that :func:`bottomk_merge` combines and
    :func:`bottomk_estimates_from_sample` reads. Selection compiles to
    TakeOrderedAndProject (per-partition top-k, never a global sort)."""
    key_str = key_col if isinstance(key_col, str) else None
    kc = F.col(key_str).cast("string") if key_str else key_col.cast("string")
    return (
        df.select(
            _md5_long(kc, seed).alias("h"),
            F.col(value_col).alias("v"),
        )
        .sort(F.asc("h"), F.asc("v"))
        .limit(k)
    )


def bottomk_merge(state: DataFrame | None, delta: DataFrame,
                  k: int) -> DataFrame:
    """Monoid combine of two bottom-k row samples: multiset union →
    re-take the k smallest (h, v). Associative and commutative. Unlike
    :func:`kmv_merge` there is deliberately NO distinct — the sample is
    over ROWS (two genuine rows may share (h, v) when a key is
    duplicated), so idempotence under replay comes from the view's
    batch-id guard, not from the merge itself."""
    if state is None:
        return delta
    return (
        state.unionByName(delta).sort(F.asc("h"), F.asc("v")).limit(k)
    )


def bottomk_estimates_from_sample(samp: DataFrame, k: int,
                                  probs_ppm: list[int]) -> DataFrame:
    """(p_ppm, est_value) — one row per requested probability — from a
    stored bottom-k sample: est(p) = the least(ceil(p·k), kept)-th
    smallest sampled value. The read path shared by the one-shot
    :func:`bottomk_quantiles` operator and the incremental view
    (streaming/matview.py:apply_bottomk_batch); see the operator's
    docstring for the estimator and determinism pins."""
    ord_ = samp.select(
        "v", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("h"))).alias("r")
    )
    idx = {p: (p * k + 999_999) // 1_000_000 for p in probs_ppm}
    # clamp the order-statistic index to the ACTUAL sample size: with
    # n < k the sample holds fewer than ceil(p·k) rows for large p, and
    # an unclamped index would silently drop that probability's output
    # row (violating the one-row-per-requested-probability contract).
    # `kept` rides along as a window count over the SAME ≤k-row ordered
    # frame (a separate scalar aggregate would reference — and re-run —
    # the whole sample-selection scan a second time); the clamp makes
    # est(p) the sample maximum, the correct order statistic for any p
    # once the sample IS the population tail. The probs⋈sample clamp
    # join is a |probs|×k nested loop over driver-side-tiny frames.
    sized = ord_.withColumn(
        "kept",
        F.count(F.lit(1)).over(
            Window.orderBy(F.asc("r")).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    probs = samp.sparkSession.createDataFrame(
        [(p, i) for p, i in sorted(idx.items())], "p_ppm bigint, r int"
    )
    # LEFT join so an EMPTY sample (fresh view, empty input) still emits
    # one row per requested probability — with a NULL est_value — instead
    # of silently dropping every output row (r7 advisor): the inner join
    # against a zero-row ordered frame produced nothing, and since the
    # oracle was empty too, differential tests could not see the drop.
    return (
        probs.alias("p")
        .join(
            sized.alias("o"),
            F.col("o.r") == F.least(F.col("p.r"), F.col("o.kept")),
            "left",
        )
        .select("p.p_ppm", F.col("o.v").alias("est_value"))
    )


def bottomk_quantiles(df: DataFrame, key_col, value_col: str,
                      probs_ppm: list[int], k: int = 256,
                      seed: int = 0) -> DataFrame:
    """Mergeable quantile estimates from ONE stored bottom-k sample
    (the missing sibling of the KMV/HLL/CMS/AMS family): keep the k rows
    whose portable hash of ``key_col`` is smallest — a uniform
    without-replacement sample and the SAME monoid as the KMV sketch
    (merge = union + re-trim to k) — and answer any posterior quantile
    query from the sample's order statistics. Returns one row per
    requested probability: (p_ppm, est_value, rank_ppm, rank_err_ppm,
    sample_k, n_total).

    Estimator: est(p) = the ceil(p·k)-th smallest sampled value, the
    classic sample-quantile bound (rank error concentrates at
    O(1/√k) ≈ 6% for k=256 — Manku et al., SIGMOD 1998 frame the
    bottom-k/random-sample summary this family refines; when the input
    holds fewer than k rows the index is clamped to the sample size, so
    est(p) degrades to the exact maximum instead of dropping the row).
    Quality is
    reported the way quantile-sketch papers report it: the TRUE rank of
    the returned value (one conditional-count pass, the eval-only scan
    the sketch replaces) against the requested rank, as rank_err_ppm —
    NOT value error, which is meaningless for heavy-tailed columns.

    Everything is deterministic and integer-exact, so the DuckDB oracle
    replays it bit-for-bit: the sample is ORDER BY (h, v) LIMIT k on the
    60-bit md5 hash, the order-statistic index is the integer
    idx = least((p_ppm·k + 999999) DIV 10⁶, kept), and ranks/errors are
    ppm DIVs on longs. Ties: (h, v) then (v, h) orderings are both total because h
    is unique over distinct keys w.h.p. and duplicated keys carry equal
    sampling fate (correct for row-population quantiles as long as
    ``key_col`` is a ROW identity, which the callers guarantee).

    Spark shape: the selection is sort(h, v).limit(k) →
    TakeOrderedAndProject (per-partition top-k, k·P rows to the driver
    merge — never a global sort); the k-row sample gets its order
    statistics from a single-partition window over k rows; rank
    evaluation broadcasts the |probs| estimate rows against one
    conditional-count aggregate scan. At 100 TB the sample IS the stored
    summary table — posterior quantile queries, like the priority
    sample's subset sums, never rescan the fact table.
    """
    samp = bottomk_rows(df, key_col, value_col, k, seed)
    targets = bottomk_estimates_from_sample(samp, k, probs_ppm)
    ranked = (
        df.select(F.col(value_col).alias("v"))
        .crossJoin(F.broadcast(targets))
        .groupBy("p_ppm", "est_value")
        .agg(
            F.expr("CAST(sum(CASE WHEN v <= est_value THEN 1 ELSE 0 END)"
                   " AS BIGINT)").alias("le"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
    )
    return (
        ranked.select(
            "p_ppm",
            "est_value",
            F.expr("(le * CAST(1000000 AS BIGINT)) DIV n_total").alias("rank_ppm"),
            F.expr("abs((le * CAST(1000000 AS BIGINT)) DIV n_total - p_ppm)")
            .alias("rank_err_ppm"),
            F.lit(k).cast("long").alias("sample_k"),
            "n_total",
        )
        .sort("p_ppm")
    )


def count_sketch_estimate(counters: DataFrame, keys: DataFrame,
                          key_col: str = "key", depth: int = 5,
                          width: int = 256) -> DataFrame:
    """Count-Sketch point estimates (Charikar-Chen-Farach-Colton 2002)
    for the keys in ``keys`` against a ``(d, b, c)`` counter frame —
    the TURNSTILE estimator: each row d contributes sign_d(key) ·
    counter[d][bucket_d(key)], and the estimate is the MEDIAN over the
    d contributions (unbiased per row; the median controls collision
    variance from both directions, which is what survives deletes —
    count-min's min-over-rows is only an upper bound under inserts).

    Hashes mirror ``streaming.matview._count_sketch_delta``: bucket seed
    d, sign seed CS_SIGN_SEED+d, both through the portable 60-bit md5
    (reproducible in ANSI SQL). A missing counter reads as 0 (zero
    counters are dropped by the fold). The counter frame is d·w rows —
    broadcast; estimates cost one narrow probe join, never a corpus
    scan. Adds ``cs_count`` (BIGINT; median of ``depth`` integers with
    depth odd is an integer) to the input key frame. Internal probe
    columns are ``_cs_``-prefixed and the counter frame is renamed
    before the join, so caller key frames may freely carry columns
    named ``d``/``b``/``s``/``c`` (r11 ADVICE); only ``_cs_*`` and the
    output ``cs_count`` are reserved.
    """
    from ..streaming.matview import CS_SIGN_SEED

    key_str = F.col(key_col).cast("string")
    probes = keys.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    (_md5_long(key_str, d) % width).alias("b"),
                    (F.lit(1) - F.lit(2) * (_md5_long(key_str, CS_SIGN_SEED + d) % 2))
                    .cast("long").alias("s"),
                )
                for d in range(1, depth + 1)
            ])
        ).alias("_cs_dbs"),
    ).select("*", F.col("_cs_dbs.d").alias("_cs_d"),
             F.col("_cs_dbs.b").alias("_cs_b"),
             F.col("_cs_dbs.s").alias("_cs_s")).drop("_cs_dbs")
    carried = [c for c in keys.columns]
    ctr = counters.select(F.col("d").alias("_cs_d"), F.col("b").alias("_cs_b"),
                          F.col("c").alias("_cs_c"))
    est = (
        probes.join(F.broadcast(ctr), ["_cs_d", "_cs_b"], "left")
        .select(*carried,
                (F.col("_cs_s") * F.coalesce(F.col("_cs_c"), F.lit(0)))
                .alias("_cs_est"))
        .groupBy(*carried)
        .agg(F.median("_cs_est").cast("long").alias("cs_count"))
    )
    return est
