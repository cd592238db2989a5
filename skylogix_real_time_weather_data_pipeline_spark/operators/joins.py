"""Join strategy helpers for scale (SURVEY.md §2.4, §4.2).

Catalyst + AQE already pick broadcast vs sort-merge and split detected
skew; these helpers cover the cases the optimizer can't see in advance:

- ``salted_join``: explicit key salting for joins whose skew is known
  upfront (a handful of hot keys owning a large fraction of rows). The
  small side is replicated salt_factor times; the big side scatters each
  hot key across salt_factor reducers.
- ``write_bucketed`` / bucketed tables: pre-shuffled storage so repeated
  co-located joins/aggregations on the bucket key skip their exchange
  entirely — the 100 TB answer to 'this join runs every day'.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on: Sequence[str] | str,
                       how: str = "inner") -> DataFrame:
    """J1: explicit broadcast of a dimension side (reference's city-dim
    enrichment, SURVEY §2.4) — map-side join at any fact size."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def salted_join(big: DataFrame, small: DataFrame, key: str, salt_factor: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: scatter the big side across ``salt_factor``
    sub-keys, replicate the small side to every sub-key, join on
    (key, salt). Deterministic salting via xxhash64 of the whole row — no
    rand(), so retries/speculative tasks agree.

    Result columns = big's + small's non-key columns (like a plain join).
    """
    big_cols = [c for c in big.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt_factor))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(df: DataFrame, table: str, bucket_key: str, n_buckets: int = 32,
                   sort_by: str | None = None, mode: str = "overwrite") -> None:
    """Persist pre-shuffled: bucketBy(bucket_key) so future joins/aggs on
    the key read co-located data and skip the exchange (verify with
    .explain — no Exchange above the scans on a bucketed-bucketed join)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def blocked_fuzzy_pairs(df: DataFrame, block_col: str, value_col: str,
                        min_dist: int = 1, max_dist: int = 2,
                        max_block_size: int = 10_000) -> DataFrame:
    """Fuzzy-match pairs by edit distance, with blocking: only values
    sharing a block key are compared, so cost is Σ |block|² instead of n².

    Same shape as the LSH candidate generators (ext/dedup.py): ONE
    aggregation gathers each block's distinct values into a sorted array,
    pairs fan out from the array (a < b by construction), and the
    levenshtein filter runs on the exploded candidates — the upstream
    distinct is evaluated once, not once per self-join side.
    ``max_block_size`` guards the degenerate hot-block case.

    Returns (block, value_a, value_b, dist).
    """
    vals = F.col("vals")
    pair_structs = F.flatten(
        F.transform(
            vals,
            lambda x, i: F.transform(
                F.slice(vals, i + 2, F.size(vals)),
                lambda y: F.struct(x.alias("value_a"), y.alias("value_b")),
            ),
        )
    )
    blocks = (
        df.groupBy(F.col(block_col).alias("block"))
        .agg(F.array_sort(F.collect_set(value_col)).alias("vals"))
        .filter((F.size("vals") >= 2) & (F.size("vals") <= max_block_size))
    )
    dist = F.levenshtein("p.value_a", "p.value_b")
    return (
        blocks.select("block", F.explode(pair_structs).alias("p"))
        .withColumn("dist", dist)
        .filter(F.col("dist").between(min_dist, max_dist))
        .select("block", "p.value_a", "p.value_b", "dist")
    )
