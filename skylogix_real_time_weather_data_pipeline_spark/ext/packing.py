"""Sequence packing for training-data preparation (r14).

The last step before text becomes model input: concatenate the corpus in
a deterministic document order and cut it into fixed-length token
windows (the GPT-style pack — documents cross window boundaries, nothing
is padded away). The hard part on a cluster is the GLOBAL token offset:
a naive ``Window.orderBy(doc_id)`` cumulative sum is a single-partition
sort — the exact anti-pattern a 100 TB corpus cannot run.

:func:`global_token_offsets` is the scalable two-phase form:

1. docs group into ORDER-CONTIGUOUS buckets (``doc_id DIV bucket_size``
   — contiguous id ranges, so bucket order IS document order);
2. one tiny aggregate produces per-bucket token sums (≤ n/bucket_size
   rows — kilobytes at any corpus scale), whose prefix sum runs as a
   window over that tiny frame and BROADCASTS back;
3. the within-bucket cumulative sum is a window PARTITIONED BY bucket —
   every window partition is bounded by ``bucket_size`` rows, so the
   sort is local and bounded regardless of corpus size.

offset = bucket prefix + within-bucket prefix, bit-identical to the
single-partition form (integer sums — associative), which is exactly
what the DuckDB oracle computes with its ordinary window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_token_offsets(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         bucket_size: int = 65536) -> DataFrame:
    """(id, n_tokens, offset): each document's token count and its global
    starting offset in the id-ordered corpus concatenation. See module
    doc for the two-phase shape; exact integer arithmetic end to end."""
    from .text import tokens

    d = df.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        (F.col(id_col).cast("long") / bucket_size).cast("long")
        .alias("_bucket"),
    )
    per = d.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bsum"))
    # prefix over the per-bucket sums: n/bucket_size rows — a driver-tiny
    # frame, so this global-order window is bounded by construction
    wb = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    offs = per.select(
        "_bucket",
        F.coalesce(F.sum("_bsum").over(wb), F.lit(0)).alias("_boff"),
    )
    ww = (
        Window.partitionBy("_bucket").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offs), "_bucket")
        .select(
            id_col,
            "n_tokens",
            (F.col("_boff")
             + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0)))
            .alias("offset"),
        )
    )


def pack_chunks(df: DataFrame, seq_len: int, text_col: str = "text",
                id_col: str = "doc_id",
                bucket_size: int = 65536) -> DataFrame:
    """Fixed-length packing summary: one row per ``seq_len``-token chunk
    of the id-ordered corpus concatenation — (chunk_id, n_docs spanning
    it, first/last doc, n_tokens: seq_len except the final remainder).
    Membership comes from pure span arithmetic on the global offsets
    (a doc covers chunks floor(off/L) .. floor((off+n-1)/L)); the
    explode fan-out is total_tokens/seq_len rows — the output size
    itself. Empty documents occupy no span and are excluded."""
    o = global_token_offsets(df, text_col, id_col, bucket_size)
    spans = o.filter(F.col("n_tokens") > 0).select(
        id_col,
        F.floor(F.col("offset") / seq_len).alias("_c0"),
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / seq_len)
        .alias("_c1"),
    )
    mem = spans.select(
        id_col, F.explode(F.sequence("_c0", "_c1")).alias("chunk_id")
    )
    total = o.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("_total"))
    return (
        mem.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .crossJoin(F.broadcast(total))  # bnlj-scalar: 1-row total
        .select(
            "chunk_id",
            "n_docs",
            "first_doc",
            "last_doc",
            F.least(
                F.lit(seq_len).cast("long"),
                F.col("_total") - F.col("chunk_id") * seq_len,
            ).alias("n_tokens"),
        )
    )
