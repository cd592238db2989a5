"""Automated driver-green window ledger (round-5 verdict item #6).

The driver's correctness harness checks only the FIRST 50 ``queries()``
entries per round, so the repo's verification claim is a UNION over rounds:
every query must be driver-green in some round AFTER its last substantive
change. That union lived in hand-maintained comments in
``plans/__init__.py``; this script makes it mechanical:

- **last_green**: highest round N whose committed ``CORRECTNESS_r{N}.json``
  shows the query hash-green (or rows-only for contractual no-oracle rows).
- **changed_in_round**: tracked via a content FINGERPRINT — md5 of the
  query callable's source (``inspect.getsource``) + its oracle SQL. The
  committed ``WINDOW_LEDGER.json`` stores each query's fingerprint; when a
  run sees a different fingerprint it bumps ``changed_in_round`` to the
  current round. (File-level git history is too coarse — one edit to
  plans/ext.py would mark ~60 queries stale.)

  The fingerprint is deliberately SHALLOW: it sees the registry-level
  callable and oracle text, not the operator bodies they call. A change
  inside e.g. ``operators/gold.py`` does not move any fingerprint, so
  tier-1 window placement for deep changes stays a review obligation —
  what the ledger automates is the bookkeeping of which rows the driver
  has actually re-checked, and when.

Usage:
    python scripts/window_ledger.py --round 6          # report + update ledger
    python scripts/window_ledger.py --round 6 --check  # report only (CI mode:
                                                       # exit 1 on any query
                                                       # changed-after-green)

Report columns: query, last driver-green round, changed-in round, status:
  OK        green in or after the round of its last change
  UNVERIFIED changed after its last driver-green round (needs a window slot)
  STALE     unchanged but last green > --stale-rounds rounds ago (refresh)
  NEVER     no driver-green row in any committed CORRECTNESS file
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import inspect
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

LEDGER_PATH = os.path.join(_HERE, "WINDOW_LEDGER.json")


def _fingerprint(fn, oracle: str | None) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    payload = src + "\n---ORACLE---\n" + (oracle or "<none>")
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def _load_correctness() -> dict[str, int]:
    """query → highest round with a driver-green row."""
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = rec.get("hash_match") is True or (
                # contractual rows-only check (no oracle): driver records
                # err == "no_oracle" (local) or null checks with row count
                rec.get("err") == "no_oracle"
                or (rec.get("hash_match") is None and rec.get("spark_rows") is not None
                    and rec.get("err") is None and rec.get("oracle_rows") is None)
            )
            if green and rnd > last_green.get(name, -1):
                last_green[name] = rnd
    return last_green


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="current round number (for changed_in_round bumps)")
    ap.add_argument("--check", action="store_true",
                    help="report only; exit 1 on UNVERIFIED/NEVER rows")
    ap.add_argument("--stale-rounds", type=int, default=3,
                    help="flag unchanged rows not re-greened in this many rounds")
    args = ap.parse_args()

    from skylogix_real_time_weather_data_pipeline_spark.plans import all_oracles, all_queries

    qs, osql = all_queries(), all_oracles()
    last_green = _load_correctness()

    ledger: dict = {}
    if os.path.exists(LEDGER_PATH):
        with open(LEDGER_PATH) as f:
            ledger = json.load(f)

    rows = []
    for name, fn in qs.items():
        fp = _fingerprint(fn, osql.get(name))
        ent = ledger.get(name)
        if ent is None:
            # bootstrap: adopt the query's last-green round as its change
            # round (the hand ledger audited green-post-change through r5);
            # brand-new queries get the current round
            changed = last_green.get(name, args.round)
        elif ent["fingerprint"] != fp:
            changed = args.round
        else:
            changed = ent["changed_in_round"]
        lg = last_green.get(name)
        if lg is None:
            status = "NEVER"
        elif changed > lg:
            status = "UNVERIFIED"
        elif args.round - lg > args.stale_rounds:
            status = "STALE"
        else:
            status = "OK"
        rows.append((name, lg, changed, status))
        ledger[name] = {"fingerprint": fp, "changed_in_round": changed,
                        "last_green": lg}

    # drop ledger entries for queries removed from the registry
    for gone in set(ledger) - set(qs):
        del ledger[gone]

    order = {"NEVER": 0, "UNVERIFIED": 1, "STALE": 2, "OK": 3}
    rows.sort(key=lambda r: (order[r[3]], r[1] if r[1] is not None else -1, r[0]))
    bad = 0
    print(f"{'query':42s} {'green':>5s} {'chg':>4s}  status")
    for name, lg, changed, status in rows:
        if status != "OK" or "-v" in sys.argv:
            print(f"{name:42s} {str(lg):>5s} {changed:>4d}  {status}")
        if status in ("NEVER", "UNVERIFIED"):
            bad += 1
    n_ok = sum(1 for r in rows if r[3] == "OK")
    n_stale = sum(1 for r in rows if r[3] == "STALE")
    print(f"-- {len(rows)} queries: {n_ok} OK, {n_stale} STALE, {bad} UNVERIFIED/NEVER")

    if not args.check:
        with open(LEDGER_PATH, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
        print(f"ledger written: {LEDGER_PATH}")
    return 1 if (args.check and bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
