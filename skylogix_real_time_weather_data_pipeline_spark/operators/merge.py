"""Delta-style MERGE (upsert) as a relational transform.

Spark has no built-in MERGE INTO outside table formats (Delta/Iceberg);
the semantics are a composition of existing operators:

    WHEN MATCHED THEN UPDATE   → target anti-join source-keys, then union
    WHEN NOT MATCHED THEN INSERT → source rows carry in unconditionally
    (optional) deletes          → final anti-join on the delete keys

Scale notes: the anti-join shuffles on the merge key exactly like any
equi-join (broadcast when the source is small — the common CDC case:
a day's updates vs years of history). With date/key-partitioned parquet
and dynamic partition overwrite, only partitions containing source keys
are rewritten — the standard warehouse MERGE shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str],
                 deletes: DataFrame | None = None) -> DataFrame:
    """MERGE semantics over DataFrames: source rows replace key-matching
    target rows (whole-row update), unmatched source rows insert, unmatched
    target rows carry over; ``deletes`` (a frame containing the key
    columns) removes keys from the result last.

    Requires source and target to share the full column set (use a
    projection first for partial-column updates). Duplicate keys within
    ``source`` are kept as-is (caller dedups when last-writer-wins is
    wanted — e.g. ``latest_order_per_customer``'s row_number pattern).
    """
    keys = list(keys)
    missing = set(target.columns) ^ set(source.columns)
    if missing:
        raise ValueError(f"target/source column sets differ on: {sorted(missing)}")
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    out = kept.unionByName(source)
    if deletes is not None:
        out = out.join(deletes.select(*keys).distinct(), keys, "left_anti")
    return out


def merge_into_parquet(spark, path: str, source: DataFrame, keys: Sequence[str],
                       deletes: DataFrame | None = None) -> None:
    """Apply :func:`merge_upsert` against a parquet table in place.

    Full-table rewrite (read → merge → overwrite); at scale, partition the
    table by a key-correlated column and enable
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` so untouched
    partitions are not rewritten. Overwrite goes through a staging path to
    avoid reading and clobbering the same files in one job.
    """
    target = spark.read.parquet(path)
    merged = merge_upsert(target, source, keys, deletes)
    staging = f"{path}__merge_staging"
    merged.write.mode("overwrite").parquet(staging)
    import shutil

    shutil.rmtree(path)
    shutil.move(staging, path)
