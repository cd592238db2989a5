"""Scale-aware parquet layout: partitioned directories + sorted row groups.

At 100 TB the dominant cost of most queries is the scan, and the scan cost
is decided at WRITE time: a table laid out as ``partition_col=…/`` dirs with
rows sorted on the secondary filter column lets a reader

- skip whole directories via partition pruning (``PartitionFilters`` in the
  scan node — zero IO for excluded partitions), and
- skip row groups inside each file via parquet min/max statistics on the
  sorted column (clustered ranges → tight stats).

``write_partitioned_sorted`` packages that layout discipline;
``verify_partition_pruning`` is the machine-checkable proof a filtered read
actually prunes (used by tests and useful as a deploy-time assertion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_sorted(df: DataFrame, path: str,
                             partition_cols: list[str], sort_cols: list[str],
                             mode: str = "overwrite") -> None:
    """Write parquet partitioned by ``partition_cols`` with rows sorted by
    ``sort_cols`` inside each task.

    The repartition on the partition columns makes each task own entire
    output directories (instead of every task appending a small file to
    every directory — the classic small-files explosion: tasks × partitions
    files); sortWithinPartitions then clusters the row groups so parquet
    min/max stats on the sort columns are tight and disjoint.

    The partition columns lead the sort: FileFormatWriter requires task
    rows ordered by partition columns and inserts its OWN sort (dropping
    any secondary order) unless the incoming ordering already starts with
    them.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def verify_partition_pruning(spark: SparkSession, path: str, filter_expr: str) -> bool:
    """True iff reading ``path`` with ``filter_expr`` prunes partitions —
    i.e. the physical scan carries a non-empty PartitionFilters list."""
    plan = (
        spark.read.parquet(path)
        .filter(filter_expr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    marker = "PartitionFilters: ["
    i = plan.find(marker)
    return i >= 0 and plan[i + len(marker)] != "]"


def zorder_key(scaled_cols: list, bits: int = 16):
    """Morton (Z-order) interleave of pre-scaled non-negative ints — bit i
    of column j lands at position i * n_cols + j. Pure Column expressions
    (shift/and/or), so the key computes inside whole-stage codegen."""
    n = len(scaled_cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str], bits: int = 12,
                   n_files: int | None = None, mode: str = "overwrite") -> None:
    """Write parquet clustered on the Z-order curve over ``cols``.

    Single-dimension sorting gives tight min/max stats on ONE column and
    useless stats on the rest; the Morton interleave bounds EVERY indexed
    column's span within each file, so row-group skipping works for filters
    on any of them (the multi-dimensional data-skipping layout Delta/
    Iceberg call OPTIMIZE ZORDER BY). Columns are scaled to ``bits``-bit
    ranks from their global min/max (one O(cols) agg on the driver);
    repartitionByRange on the key gives each output file a contiguous curve
    segment.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            )
        )
    keyed = df.withColumn("_zkey", zorder_key(scaled, bits))
    if n_files:
        keyed = keyed.repartitionByRange(n_files, "_zkey")
    else:
        keyed = keyed.repartitionByRange("_zkey")
    (
        keyed.sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Compact a small-files parquet directory in place: rewrite to
    ceil(total_bytes / target) files via coalesce (a narrow repack — no
    shuffle) and an atomic staging swap. Returns the new file count.

    The maintenance half of the layout story: streaming appends and
    over-parallel writes accrete kilobyte files whose per-file open/footer
    cost dominates scans at scale; periodic compaction restores
    scan-efficient file sizes without changing row order or content.
    """
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    staging = f"{path}__compacting"
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    shutil.move(staging, path)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
