"""Read amplification of the LSM-segmented view state vs segment count
(round-11 verdict item #2).

The segmented appliers write O(batch) immutable segments and defer the
monoid fold to read time; the open question r10 left was WHEN to compact —
SEGMENT_SCALE_r10 only ever measured 1-2 raw segments. This probe answers
it empirically at sf10x (~600k docs / ~27M tokens): partition the corpus
into N batches, apply each as a raw segment, and time the read-side merge
at N ∈ {1, 4, 16, 64} raw segments plus the post-compaction floor, for the
two structurally different views:

- gram index  — the heaviest state (one row per distinct 8-gram), capped
  posting-list semilattice merge (flatten + slice + over-fold);
- term stats  — light state (one row per distinct token), plain additive
  monoid merge.

Read cost = full materialization of the merged view (count() after the
groupBy fold — the shape every *_from_index read path pays before its own
work). Median of --reps timed runs. The chosen auto-compaction trigger
(streaming.matview.AUTO_COMPACT_SEGMENTS) is recorded next to the curve
it was read off.

Usage:
    python scripts/segment_read_amp.py [--out SEGMENT_READ_AMPLIFICATION_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

SF10X = os.path.join(_HERE, ".scale_probe", "sf10x")
WORK = os.path.join(_HERE, ".scale_probe", "segread")


def _timed(fn, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        out.append(round(time.monotonic() - t0, 3))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_HERE, "SEGMENT_READ_AMPLIFICATION_r11.json"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--counts", type=int, nargs="+", default=[1, 4, 16, 64])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.session import get_spark
    from skylogix_real_time_weather_data_pipeline_spark.streaming import matview as mv

    spark = get_spark(app_name="segment-read-amp", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{SF10X}/documents.parquet"):
        print("sf10x probe corpus missing — run scripts/substring_exponent.py first",
              file=sys.stderr)
        return 1
    docs = spark.read.parquet(f"{SF10X}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()

    VIEWS = {
        "gram_index": dict(
            apply=lambda bdf, b, d: mv.apply_gram_index_delta(
                bdf, b, d, k=8, max_gram_df=1_000, auto_compact=None),
            read=lambda d: mv.read_gram_index_segments(spark, d, max_gram_df=1_000),
            compact=lambda d: mv.compact_gram_index_segments(spark, d, max_gram_df=1_000),
        ),
        "term_stats": dict(
            apply=lambda bdf, b, d: mv.apply_term_stats_delta(
                bdf, b, d, auto_compact=None),
            read=lambda d: mv.read_term_stats_segments(spark, d),
            compact=lambda d: mv.compact_term_stats_segments(spark, d),
        ),
    }

    results = {"_meta": {
        "corpus": f"sf10x ({n_docs} docs)",
        "read": "merged-view full materialization (count after the monoid fold)",
        "reps": args.reps,
        "chosen_auto_compact": mv.AUTO_COMPACT_SEGMENTS,
    }}
    for vname, fns in VIEWS.items():
        results[vname] = {}
        for n_seg in args.counts:
            state = os.path.join(WORK, f"{vname}_{n_seg}")
            shutil.rmtree(state, ignore_errors=True)
            # deterministic equal-mass split: doc_id % n_seg
            t0 = time.monotonic()
            for b in range(n_seg):
                part = docs.filter(F.col("doc_id") % n_seg == b)
                fns["apply"](part, b, state)
            apply_total = round(time.monotonic() - t0, 3)

            merged_rows = [0]

            def _read():
                merged_rows[0] = fns["read"](state).count()

            reads = _timed(_read, args.reps)

            t0 = time.monotonic()
            covered = fns["compact"](state)
            compact_s = round(time.monotonic() - t0, 3)
            reads_c = _timed(_read, args.reps)

            results[vname][str(n_seg)] = {
                "apply_total_s": apply_total,
                "read_s": statistics.median(reads),
                "read_series": reads,
                "read_after_compact_s": statistics.median(reads_c),
                "compact_s": compact_s,
                "compact_covered": covered,
                "merged_rows": merged_rows[0],
            }
            print(f"{vname} n_seg={n_seg}: read {statistics.median(reads)}s "
                  f"(after compact {statistics.median(reads_c)}s, "
                  f"compact {compact_s}s, rows {merged_rows[0]})", flush=True)
            shutil.rmtree(state, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
