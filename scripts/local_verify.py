"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry (or the names passed on argv) through a fresh
SparkSession at sf0.01 and compares against ``oracle_sql()`` in DuckDB:
row count + sorted column names + order-insensitive value comparison
(repr-normalized cells, floats to 9 significant digits — queries round
visible floats to 6 anyway).

Usage:
    python scripts/local_verify.py                # all queries
    python scripts/local_verify.py q1 q2 ...      # a subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/local_verify.py

Writes one JSON object (same shape as the driver's CORRECTNESS_r{N}.json)
to stdout, and exits non-zero on any mismatch.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    return str(v)


def _normalize(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or list(qs)
    results, failed = {}, []
    for name in names:
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name not in osql:
                rec["err"] = "no_oracle"
                results[name] = rec
                print(f"{name}: rows-only ({len(s_rows)} rows)", file=sys.stderr)
                continue
            res = con.execute(osql[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            rec["oracle_rows"] = len(d_rows)
            rec["rows_match"] = len(s_rows) == len(d_rows)
            rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
            _, sn = _normalize(s_cols, s_rows)
            _, dn = _normalize(d_cols, d_rows)
            rec["hash_match"] = rec["rows_match"] and rec["schema_match"] and sn == dn
            status = "OK" if rec["hash_match"] else "MISMATCH"
            print(f"{name}: {status} ({len(s_rows)} rows)", file=sys.stderr)
            if not rec["hash_match"]:
                failed.append(name)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            failed.append(name)
            print(f"{name}: ERROR {rec['err']}", file=sys.stderr)
        results[name] = rec
    print(json.dumps(results, indent=2))
    if failed:
        print(f"FAILED: {failed}", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
