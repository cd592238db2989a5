"""Streaming incremental near-dup: the stateful MinHash-LSH pair stream
must emit, across micro-batches, exactly the batch pipeline's candidate
pairs on the same data (VERDICT r2 item #4)."""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F

from skylogix_real_time_weather_data_pipeline_spark.ext import dedup
from skylogix_real_time_weather_data_pipeline_spark.streaming.stateful import (
    streaming_minhash_pairs,
)

# near-dup clusters spanning batches: docs 0/3 identical, 1/4 share most
# shingles, 2 and 5 are unrelated
_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "pack my box with five dozen liquor jugs for the party"),
    (2, "completely unrelated text about spark execution plans"),
    (3, "the quick brown fox jumps over the lazy dog tonight"),
    (4, "pack my box with five dozen liquor jugs for the occasion"),
    (5, "another unrelated document mentioning watermarks and state"),
]


def test_rowwise_banding_matches_batch_banding(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rowwise = {
        (r.doc_id, r.band_idx): r.band_hash
        for r in dedup.minhash_bands_rowwise(df).collect()
    }
    sig = dedup.minhash_signatures(df)
    batch = {
        (r.doc_id, r.band_idx): r.band_hash
        for r in sig.select(
            "doc_id", F.explode(F.array(*dedup.band_structs(16, 4))).alias("b")
        ).select("doc_id", "b.band_idx", "b.band_hash").collect()
    }
    assert rowwise == batch


def test_streaming_pairs_equal_batch_pairs_across_micro_batches(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    for name, chunk in (("b1.json", _DOCS[:3]), ("b2.json", _DOCS[3:5]), ("b3.json", _DOCS[5:])):
        with open(src / name, "w") as f:
            for doc_id, text in chunk:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_minhash_pairs(stream)
        .writeStream.format("memory")
        .queryName("neardup_mem")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stream_pairs = {
        (r.id_a, r.id_b) for r in spark.table("neardup_mem").collect()
    }
    batch_df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    batch_pairs = {
        (r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(batch_df).collect()
    }
    assert (0, 3) in stream_pairs  # identical docs split across batches
    assert stream_pairs == batch_pairs
