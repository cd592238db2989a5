"""Read amplification of a DELETE-heavy window vs retraction ratio and
tombstone segment count (round-12, r11 verdict item #6).

RETRACT_SCALE_r11 measured ONE point (10% shard, one tombstone segment)
and found the post-retract read ~5x the post-compact read for the
exact-dedup view at sf10x. This probe maps the regime: for retraction
ratio r in {10%, 30%, 50%} of docs and the retracted weight split across
t in {1, 4, 8} tombstone segments, build the view (2 base segments,
manual protocol), apply the tombstones, and time

  read_after_retract_s  - the merge-on-read fold over base + tombstones
  compact_s             - folding everything to one segment
  read_after_compact_s  - the compacted floor
  amplification         - read_after_retract / read_after_compact

for the two structurally different Z-set views (doc-granular exact-dedup
fingerprints; the gram index with capped posting semilattice). The
TOMBSTONE_COMPACT_FRACTION trigger default is recorded next to the curve
it was read off.

Usage: python scripts/retract_read_amp.py [--round N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1X = os.path.join(_HERE, ".scale_probe", "sf1x")
SF10X = os.path.join(_HERE, ".scale_probe", "sf10x")
WORK = os.path.join(_HERE, ".scale_probe", "retract_amp")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--ratios", type=int, nargs="+", default=[10, 30, 50],
                    help="retraction ratios in percent of docs")
    ap.add_argument("--tombstones", type=int, nargs="+", default=[1, 4, 8],
                    help="how many segments the retracted weight spans")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from skylogix_real_time_weather_data_pipeline_spark.session import get_spark
    from skylogix_real_time_weather_data_pipeline_spark.streaming.matview import (
        TOMBSTONE_COMPACT_FRACTION,
        apply_exact_dedup_retractable_delta,
        apply_gram_index_retractable_delta,
        compact_exact_dedup_retractable_segments,
        compact_gram_index_retractable_segments,
        read_exact_dedup_retractable_segments,
        read_gram_index_retractable_segments,
        retract_exact_dedup_delta,
        retract_gram_index_delta,
    )

    spark = get_spark(
        app_name="retract-read-amp",
        master="local[32]",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 << 20)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{SF10X}/documents.parquet"):
        from substring_exponent import _gen_sf10x

        _gen_sf10x(spark)

    views = {
        "exact_dedup": {
            "apply": apply_exact_dedup_retractable_delta,
            "retract": retract_exact_dedup_delta,
            "read": read_exact_dedup_retractable_segments,
            "compact": compact_exact_dedup_retractable_segments,
        },
        "gram_index": {
            "apply": apply_gram_index_retractable_delta,
            "retract": retract_gram_index_delta,
            "read": read_gram_index_retractable_segments,
            "compact": compact_gram_index_retractable_segments,
        },
    }

    out = {"_meta": {
        "base_segments": 2,
        "tombstone_compact_fraction": round(TOMBSTONE_COMPACT_FRACTION, 4),
        "claim": "amplification = read_after_retract / read_after_compact; "
                 "the fraction trigger is chosen so a sustained delete "
                 "window compacts before the amplification regime, while "
                 "pure-ingest windows never pay the check",
    }}
    for label, sf in (("sf1x", SF1X), ("sf10x", SF10X)):
        docs = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text")
        n = docs.count()
        rec = {"docs": n}
        for view, fns in views.items():
            vrec = {}
            for pct in args.ratios:
                gone = docs.filter(F.col("doc_id") % 100 < pct)
                for t in args.tombstones:
                    state = os.path.join(WORK, label, view, f"r{pct}_t{t}")
                    shutil.rmtree(state, ignore_errors=True)
                    fns["apply"](docs.filter(F.col("doc_id") % 2 == 0), 0,
                                 state, auto_compact=None)
                    fns["apply"](docs.filter(F.col("doc_id") % 2 == 1), 1,
                                 state, auto_compact=None)
                    for j in range(t):
                        fns["retract"](gone.filter(F.col("doc_id") % t == j),
                                       2 + j, state, auto_compact=None)
                    t0 = time.monotonic()
                    rows_r = fns["read"](spark, state).count()
                    read_r = round(time.monotonic() - t0, 3)
                    t0 = time.monotonic()
                    fns["compact"](spark, state)
                    compact_s = round(time.monotonic() - t0, 3)
                    t0 = time.monotonic()
                    rows_c = fns["read"](spark, state).count()
                    read_c = round(time.monotonic() - t0, 3)
                    assert rows_c == rows_r, (view, label, pct, t)
                    cell = {
                        "read_after_retract_s": read_r,
                        "compact_s": compact_s,
                        "read_after_compact_s": read_c,
                        "amplification": round(read_r / max(read_c, 1e-9), 2),
                        "rows": rows_c,
                    }
                    vrec[f"ratio{pct}_tomb{t}"] = cell
                    print(f"# {label}/{view}/r{pct}/t{t}: {cell}",
                          file=sys.stderr, flush=True)
                    shutil.rmtree(state, ignore_errors=True)
            rec[view] = vrec
        out[label] = rec
    path = os.path.join(_HERE, f"RETRACT_READ_AMPLIFICATION_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
