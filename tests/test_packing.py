"""Sequence packing (ext/packing.py, r14): the two-phase global offset
equals the naive single-partition window, chunk arithmetic, empty docs,
and the scalability shape (no corpus-wide global-order window)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from skylogix_real_time_weather_data_pipeline_spark.ext.packing import (
    global_token_offsets,
    pack_chunks,
)
from skylogix_real_time_weather_data_pipeline_spark.ext.text import tokens


def _corpus(spark, n=300):
    # variable lengths incl. empty docs and one giant doc that spans
    # multiple chunks on its own
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 17 == 0, F.lit(""))
        .when(F.col("id") % 31 == 0,
              F.concat_ws(" ", F.array_repeat(F.lit("w"), 200)))
        .otherwise(
            F.concat_ws(" ", F.array_repeat(
                F.lit("t"), (F.col("id") % 13 + 1).cast("int")))
        ).alias("text"),
    )


def test_two_phase_offsets_equal_naive_window(spark):
    """offset from the bucketed two-phase form must be bit-identical to
    the single-partition cumulative sum, at a bucket size small enough
    (16) that hundreds of bucket boundaries are crossed."""
    docs = _corpus(spark)
    got = {r["doc_id"]: (r["n_tokens"], r["offset"])
           for r in global_token_offsets(docs, bucket_size=16).collect()}
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {r["doc_id"]: (r["n"], r["off"]) for r in docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n")
    ).select(
        "doc_id", "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("off")
    ).collect()}
    assert got == want


def test_pack_chunks_invariants(spark):
    """Chunk rows tile the corpus exactly: token counts sum to the corpus
    total, every chunk is full except the last, boundary docs chain
    (first_doc of chunk k <= last_doc of chunk k-1 + 1), and a
    multi-chunk giant doc appears in every chunk it spans."""
    docs = _corpus(spark)
    L = 64
    rows = sorted(map(tuple, pack_chunks(docs, seq_len=L, bucket_size=16)
                      .select("chunk_id", "n_docs", "first_doc",
                              "last_doc", "n_tokens").collect()))
    total = docs.select(F.sum(F.size(tokens("text")))).collect()[0][0]
    assert sum(r[4] for r in rows) == total
    assert [r[0] for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r[4] == L
    assert 0 < rows[-1][4] <= L
    # membership continuity: the next chunk starts at the previous
    # chunk's boundary doc (shared when it crosses) or later — never
    # backwards. Strict adjacency (b.first == a.last or a.last+1) cannot
    # be pinned: EMPTY docs occupy no span and legitimately leave id
    # gaps between consecutive chunks.
    for a, b in zip(rows, rows[1:]):
        assert b[2] >= a[3], (a, b)   # monotone boundary docs
        assert b[3] >= a[3] and b[2] <= b[3], (a, b)
    # the giant doc (200 tokens > 2 chunks at L=64) spans >= 3 chunks
    giant = [r for r in rows if r[2] <= 31 <= r[3]]
    assert len(giant) >= 3


def test_corpus_path_has_no_global_order_window(spark):
    """Scalability pin: the only SinglePartition exchange in the live
    plan feeds the bucket-prefix window, whose input is the AGGREGATED
    per-bucket frame (n/bucket_size rows) — the corpus-sized path stays
    hash-partitioned by bucket (its window partitions by _bucket, so
    every window sort is bounded by bucket_size rows)."""
    from tests.test_plan_quality import _walk_live_plan

    docs = _corpus(spark, n=2000)
    df = global_token_offsets(docs, bucket_size=64)
    df.count()
    nodes = _walk_live_plan(df)
    singles = [s for n, s in nodes
               if n == "ShuffleExchangeExec" and "SinglePartition" in s]
    assert len(singles) == 1, singles
    assert any(n == "ShuffleExchangeExec" and "hashpartitioning(_bucket" in s
               for n, s in nodes), "corpus path lost its bucket partitioning"
    windows = [s for n, s in nodes if n == "WindowExec"]
    assert any("[_bucket" in s for s in windows), (
        "the corpus window must partition by bucket")
