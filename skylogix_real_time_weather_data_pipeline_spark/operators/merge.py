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


def scd2_apply(dim: DataFrame, changes: DataFrame, keys: Sequence[str],
               attrs: Sequence[str], effective_date: str,
               start_col: str = "valid_from", end_col: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension, closing superseded rows instead of overwriting
    them (the history-preserving counterpart of :func:`merge_upsert`).

    Input contract: ``dim`` carries keys + attrs + [start_col, end_col]
    (NULL end = current row); ``changes`` carries keys + attrs only.
    Semantics per change row:

    - key exists and any attr differs → the current row is CLOSED
      (end = effective_date) and a new current row opens;
    - key exists with identical attrs → no-op (idempotent re-deliveries
      don't fabricate versions);
    - new key → inserted as a current row.

    Plan shape: history rows pass through untouched; ONE full-outer join
    of current rows vs changes on the key (broadcast when the change
    batch is small — the nightly-CDC case), then each joined row fans out
    to 0-2 output rows through a filtered array→explode — single
    evaluation, no branch re-joins. Everything shuffles on the dimension
    key only.
    """
    from pyspark.sql import functions as F

    keys, attrs = list(keys), list(attrs)
    out_cols = keys + attrs + [start_col, end_col]
    cur = dim.filter(F.col(end_col).isNull())
    hist = dim.filter(F.col(end_col).isNotNull()).select(*out_cols)
    t, s = cur.alias("t"), changes.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    t_key = F.col(f"t.{keys[0]}")
    s_key = F.col(f"s.{keys[0]}")
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(f"t.{a}").eqNullSafe(F.col(f"s.{a}"))
    eff = F.to_date(F.lit(effective_date))
    null_date = F.lit(None).cast("date")

    def _row(side: str, start, end):
        key_src = "t" if side == "t" else "s"
        fields = [F.col(f"{key_src}.{k}").alias(k) for k in keys]
        fields += [F.col(f"{side}.{a}").alias(a) for a in attrs]
        fields += [start.alias(start_col), end.alias(end_col)]
        return F.struct(*fields)

    branches = F.array(
        # current row survives unchanged (no change row, or identical attrs)
        F.when(
            t_key.isNotNull() & (s_key.isNull() | ~changed),
            _row("t", F.col(f"t.{start_col}"), null_date),
        ),
        # superseded current row closes at the effective date
        F.when(
            t_key.isNotNull() & s_key.isNotNull() & changed,
            _row("t", F.col(f"t.{start_col}"), eff),
        ),
        # new version / brand-new key opens at the effective date
        F.when(
            s_key.isNotNull() & (t_key.isNull() | changed),
            _row("s", eff, null_date),
        ),
    )
    fanned = j.select(
        F.explode(F.filter(branches, lambda x: x.isNotNull())).alias("r")
    ).select("r.*")
    return fanned.unionByName(hist)
