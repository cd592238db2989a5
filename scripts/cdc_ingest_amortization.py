"""CDC pure-insert amortization probe (r13, r12 ADVICE medium).

The changelog router lands an EMPTY tombstone segment every pure-insert
micro-batch (replay-guard completeness). Before the r13 fix those
counted toward TOMBSTONE_COMPACT_FRACTION, so every batch after the
first folded the ENTIRE view — O(view) per batch, O(n²) over the
stream. This probe measures what the fix actually buys: drive N
pure-insert micro-batches through the retractable exact-dedup appliers
in the router's apply/retract(empty) shape at sf0.1, record per-batch
wall time and the compaction count, and contrast with a FORCED
compact-every-batch protocol (the pre-fix behavior, simulated by
calling the compactor after each batch).

Expected shape: fixed-path per-batch time roughly FLAT (O(batch) +
bounded read-side segment count), zero auto-compactions; the simulated
pre-fix path grows roughly linearly per batch (each compaction folds
the whole accumulated view), i.e. quadratically in total.

Usage: python scripts/cdc_ingest_amortization.py [--round N]
Writes CDC_INGEST_AMORTIZATION_r{N}.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from skylogix_real_time_weather_data_pipeline_spark.session import get_spark  # noqa: E402
from skylogix_real_time_weather_data_pipeline_spark.streaming.matview import (  # noqa: E402
    _parquet_dir_rows,
    _segments_root,
    apply_exact_dedup_retractable_delta,
    apply_gram_index_retractable_delta,
    compact_exact_dedup_retractable_segments,
    compact_gram_index_retractable_segments,
    read_exact_dedup_retractable_segments,
    read_gram_index_retractable_segments,
    retract_exact_dedup_delta,
    retract_gram_index_delta,
    segment_stats,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 12

#: view families probed: the doc-granular exact-dedup Z-set (small state
#: — shows that fixed per-batch overhead dominates either way at test
#: scale) and the GRAM INDEX Z-set (corpus-token-sized state, ~20M rows
#: at sf1x — the view whose O(view) per-batch fold is the quadratic blow
#: the r12 ADVICE flagged; this is where the fix is measurable).
VIEWS = {
    "exact_dedup": (
        apply_exact_dedup_retractable_delta,
        retract_exact_dedup_delta,
        compact_exact_dedup_retractable_segments,
        read_exact_dedup_retractable_segments,
    ),
    "gram_index": (
        apply_gram_index_retractable_delta,
        retract_gram_index_delta,
        compact_gram_index_retractable_segments,
        read_gram_index_retractable_segments,
    ),
}


def main() -> int:
    rnd = 13
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    spark = get_spark(app_name="cdc-amortization", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    docs.count()  # warm
    empty = spark.createDataFrame([], "doc_id long, text string")

    def run(view: str, protocol: str) -> dict:
        apply_fn, retract_fn, compact_fn, read_fn = VIEWS[view]
        root = tempfile.mkdtemp(prefix=f"cdc_amort_{view}_{protocol}_")
        state = os.path.join(root, "view")
        per_batch, fold_rows, seen_folds = [], [], set()

        def _new_fold_rows() -> int:
            # rows REWRITTEN by compaction folds since the last check —
            # footer metadata only, machine-independent (the wall-clock
            # numbers on a shared box are too noisy to carry the O(n²)
            # argument alone; the churned-row series is deterministic)
            seg_root = _segments_root(state)
            total = 0
            if os.path.isdir(seg_root):
                for name in os.listdir(seg_root):
                    if name.startswith("compact_") and name not in seen_folds:
                        seen_folds.add(name)
                        total += _parquet_dir_rows(os.path.join(seg_root, name))
            return total

        try:
            for b in range(N_BATCHES):
                part = docs.filter(F.col("doc_id") % N_BATCHES == b)
                t0 = time.perf_counter()
                # the router's per-micro-batch shape: adds at 2b, a
                # (possibly empty) tombstone at 2b+1
                apply_fn(part, 2 * b, state)
                retract_fn(empty, 2 * b + 1, state)
                if protocol == "compact_every_batch":
                    # pre-fix behavior: the empty tombstone crossed the
                    # 1/3 fraction and folded the whole view every batch
                    compact_fn(spark, state)
                per_batch.append(round(time.perf_counter() - t0, 3))
                fold_rows.append(_new_fold_rows())
            stats = segment_stats(state)
            n_rows = read_fn(spark, state).count()
            return {
                "per_batch_s": per_batch,
                "total_s": round(sum(per_batch), 3),
                "first3_mean_s": round(sum(per_batch[:3]) / 3, 3),
                "last3_mean_s": round(sum(per_batch[-3:]) / 3, 3),
                "late_over_early": round(
                    sum(per_batch[-3:]) / max(sum(per_batch[:3]), 1e-9), 2),
                "fold_rows_per_batch": fold_rows,
                "fold_rows_total": sum(fold_rows),
                "n_folds": len(seen_folds),
                "compact_segments": stats["compact_segments"],
                "raw_segments": stats["raw_segments"],
                "view_rows": n_rows,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out = {
        "_meta": {
            "sf_dir": SF_DIR,
            "n_batches": N_BATCHES,
            "shape": "router per-micro-batch: apply(adds) + retract(EMPTY) "
                     "— the pure-insert CDC stream",
            "contrast": "compact_every_batch simulates the pre-r13 "
                        "empty-tombstone trigger misfire (O(view) fold per "
                        "batch); fixed is the shipped path",
        },
    }
    for view in VIEWS:
        out[view] = {
            "fixed": run(view, "fixed"),
            "compact_every_batch": run(view, "compact_every_batch"),
        }
        f, c = out[view]["fixed"], out[view]["compact_every_batch"]
        out[view]["verdict"] = (
            f"fixed: {f['n_folds']} folds / {f['fold_rows_total']} rows "
            f"rewritten, {f['total_s']}s total; per-batch-compaction: "
            f"{c['n_folds']} folds / {c['fold_rows_total']} rows rewritten "
            f"(O(n^2) churn), {c['total_s']}s total"
        )
    path = os.path.join(_HERE, f"CDC_INGEST_AMORTIZATION_r{rnd}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: (v.get("verdict") if isinstance(v, dict) else v)
                      for k, v in out.items()}, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
