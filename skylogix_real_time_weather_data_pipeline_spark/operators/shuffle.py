"""Deterministic global shuffle and sharding for training-data export.

Training pipelines need the corpus in a pseudorandom but REPRODUCIBLE
order, cut into fixed-size shards. The naive Spark spelling —
``row_number() OVER (ORDER BY hash)`` with no partition — collapses the
whole table into one task (the classic global-window bottleneck). Here the
global rank is computed distributively:

1. bucket each row by the HIGH BITS of its 60-bit md5 shuffle hash
   (``_pid = _h div ceil(2^60 / n)``) — the hash is uniform, so the n
   buckets are balanced, and the bucket id is monotone in the sort key, so
   bucket p holds exactly the rows ranked between buckets p-1 and p+1;
2. per-bucket row counts → cumulative offsets (an O(n) driver list,
   broadcast back);
3. rank = bucket offset + intra-bucket row_number, where the window
   partitions by the bucket id — every task ranks its own slice in
   parallel.

The hash is md5-based (portable: an ANSI oracle reproduces the exact
permutation bit-for-bit), with the id as tiebreaker so the total order is
unique and the result is independent of physical partitioning.

Why explicit hash buckets instead of ``repartitionByRange`` (the r7 shape):
RangePartitioner picks boundaries by SAMPLING, seeded from the RDD id — a
recompute of the lineage (e.g. after the owned-cache registry releases the
persisted frame) could draw different boundaries than the ones the collected
offsets were built from, silently corrupting ranks (r7 advisor, medium).
``_h div width`` is a pure function of the data: every recompute assigns
every row the same bucket, so the persist below is a pure performance
optimization and release-then-recompute is always safe. It also drops the
range-sampling job (one fewer pass over the input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shuffle_hash(id_col: str, seed: int) -> F.Column:
    """Portable 60-bit shuffle key: first 15 hex chars of md5(seed|id).
    Mirrors SQL CAST(concat('0x', substr(md5(...), 1, 15)) AS BIGINT).

    A NULL id hashes via a \\x00-prefixed sentinel (no cast of a real id
    can produce it) instead of propagating NULL — an un-coalesced concat
    would make _h, and then the bucket id, NULL, and the driver's
    sorted(counts) would crash on the None key. Rank determinism for a
    null id follows the same contract as any id: unique → deterministic;
    duplicated (two NULL ids, like two equal ids) → ties break
    arbitrarily, which callers already must not rely on."""
    id_str = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), id_str)), 1, 15),
        16,
        10,
    ).cast("long")


def global_rank(df: DataFrame, id_col: str, seed: int = 0,
                n_partitions: int | None = None) -> DataFrame:
    """Attach ``_rank`` (0-based) in md5-shuffled order without a global
    single-partition sort. Deterministic for a given (data, seed)
    regardless of input partitioning or cluster size."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # bucket id from the hash's high bits: deterministic (data-only, no
    # sampling, no RDD-id dependence) and monotone in _h, so offsets stay
    # valid across recomputes; `div` keeps the 60-bit arithmetic integral
    width = ((1 << 60) + n - 1) // n
    from ..cache import owned_persist

    parts = owned_persist(
        df.withColumn("_h", _shuffle_hash(id_col, seed))
        .withColumn("_pid", F.expr(f"CAST(_h DIV {width}L AS INT)"))
    )
    counts = {r["_pid"]: r["cnt"] for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        parts.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy("_h", id_col)
    return (
        parts.join(off_df, "_pid")
        .withColumn("_rank", F.col("_off") + F.row_number().over(w) - 1)
        .drop("_pid", "_off")
    )


def shard_for_training(df: DataFrame, shard_size: int, id_col: str = "doc_id",
                       seed: int = 0) -> DataFrame:
    """Deterministic shuffle-and-shard: (id, shard, pos_in_shard) with
    shard = rank // shard_size over the md5 permutation. Feed the result to
    ``write_partitioned_sorted(..., ["shard"], ["pos_in_shard"])`` to lay
    the shards out as one directory each."""
    ranked = global_rank(df.select(id_col), id_col, seed)
    return ranked.select(
        id_col,
        (F.col("_rank") / shard_size).cast("long").alias("shard"),
        (F.col("_rank") % shard_size).alias("pos_in_shard"),
    )


def budget_select(df: DataFrame, score_col: str, weight_col: str,
                  budget: int, id_col: str = "doc_id") -> DataFrame:
    """Token-budget corpus selection: walk the corpus in quality order
    (``score_col`` DESC, id ASC) and keep every document while the
    cumulative ``weight_col`` (token count) stays ≤ ``budget`` — the
    greedy-prefix data-selection rule curation pipelines apply when a
    training run has a fixed token budget ("take the best N tokens").

    The global running total is computed WITHOUT a single-partition
    window (the same discipline as :func:`global_rank`): the score
    itself is the bucket key — it is trivially monotone in the sort
    order, so bucket offsets are exact —

    1. per-score weight totals → cumulative offsets in score-descending
       order (an O(distinct scores) driver fold, broadcast back);
    2. within each score, one window ordered by id accumulates weights;
    3. cumulative = score-bucket offset + intra-score running sum.

    PRECONDITION: ``score_col`` is a DISCRETE, bounded-cardinality,
    NON-NULL value (an integer quality score, a quantized probability —
    any orderable Spark type works; the offsets frame reuses the input
    column's own DataType) — the driver fold is O(distinct scores) and
    each score's docs rank inside one window partition. Quantize
    continuous scores first (which deterministic selection wants anyway:
    float order is not portable). NULL scores have no place in a total
    quality order and raise ValueError. Ties inside a score resolve by
    id, so the kept set is unique and reproducible on any cluster layout.

    Output: every input row with (cum_weight, keep) — the decision
    table, like the dedup family; filter keep for the selected corpus.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    from ..cache import owned_persist

    parts = owned_persist(
        df.select(id_col, score_col, F.col(weight_col).cast("long").alias("_w"))
    )
    totals = {
        r["s"]: r["tw"]
        for r in parts.groupBy(F.col(score_col).alias("s"))
        .agg(F.sum("_w").alias("tw"))
        .collect()
    }
    if None in totals:
        raise ValueError(
            f"budget_select: NULL values in score column {score_col!r} — "
            "a total quality order is undefined; filter or impute first"
        )
    if any(s != s for s in totals):  # NaN: not orderable, not discrete
        raise ValueError(
            f"budget_select: NaN values in score column {score_col!r} — "
            "a total quality order is undefined; filter or impute first"
        )
    offsets, acc = {}, 0
    for s in sorted(totals, reverse=True):  # score DESC
        offsets[s] = acc
        acc += totals[s]
    off_schema = StructType([
        StructField(score_col, parts.schema[score_col].dataType, False),
        StructField("_off", LongType(), False),
    ])
    off_df = F.broadcast(
        parts.sparkSession.createDataFrame(
            [(s, o) for s, o in offsets.items()], off_schema
        )
    )
    w = (
        Window.partitionBy(score_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("_off") + F.sum("_w").over(w)
    return (
        parts.join(off_df, score_col)
        .select(
            id_col,
            score_col,
            F.col("_w").alias(weight_col),
            cum.alias("cum_weight"),
            (cum <= budget).alias("keep"),
        )
    )


def source_cap_select(df: DataFrame, per_source: int, score_col: str,
                      source_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-source document cap — the domain-balancing selection rule
    curation pipelines apply so one crawl domain cannot dominate the
    training mix (C4/RefinedWeb-style per-host caps, Gopher's
    per-source budgets): within each source keep the ``per_source``
    best documents by ``score_col`` (DESC, NULLs last, ties by id ASC),
    mark everything else dropped.

    Output: every input row with (source, score, source_rank, keep) —
    the decision table, like the dedup family; filter keep for the
    selected corpus.

    Plan shape / 100 TB: ONE row_number window partitioned by source —
    a single hash exchange on the source key plus a per-partition
    spill-safe sort. A skewed giant source sorts its whole partition to
    rank documents it will then drop; if a deployment's sources are
    pathologically skewed, pre-aggregate a per-source score THRESHOLD
    from a sample and pre-filter before the exact window — the exact
    form here is the correctness contract either way.
    """
    w = Window.partitionBy(source_col).orderBy(
        F.desc_nulls_last(score_col), F.asc(id_col)
    )
    rank = F.row_number().over(w)
    return df.select(
        id_col, source_col, score_col,
        rank.alias("source_rank"),
        (rank <= per_source).alias("keep"),
    )
