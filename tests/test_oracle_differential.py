"""Differential oracle test: every queries() entry vs its DuckDB oracle_sql()
at sf0.001 — mirrors the driver's CORRECTNESS gate (row count + column names
+ order-insensitive values).

This is the primary correctness harness (SURVEY.md §5.2 layer 2). Values are
compared after normalizing (sorted columns, sorted rows, repr-normalized
cells) — floats are compared to 9 significant decimals to accommodate the
engines' summation-order ulps; queries round their visible float outputs to
6 decimals anyway, so any drift beyond that is a real bug.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import __spark_entry__ as ENTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    return str(v)


def _normalize(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out


ORACLED = sorted(k for k in ENTRY.queries() if k in ENTRY.oracle_sql())
ROWS_ONLY = sorted(k for k in ENTRY.queries() if k not in ENTRY.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    sdf = ENTRY.queries()[name](spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ENTRY.oracle_sql()[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"

    sc, sn = _normalize(s_cols, s_rows)
    dc, dn = _normalize(d_cols, d_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: "
        f"spark={sn[mismatches[0]]} oracle={dn[mismatches[0]]} cols={sc}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    sdf = ENTRY.queries()[name](spark, sf_dir)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "temp_mean" in df.columns
