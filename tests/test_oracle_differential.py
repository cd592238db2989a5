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


def test_oracle_isqrt_exact_on_adversarial_values():
    """The distill oracle's integer-isqrt chain (double seed → Newton step
    → two downward clamps) must equal math.isqrt for variances past the
    2^52 double-exactness bound, including the worst cases: perfect
    squares and squares±1, where FLOOR(SQRT(double)) flips."""
    con = duckdb.connect()
    ks = [3, 10**6, 67_000_000, 10**8 + 7, 10**9 + 123, 2**31 - 1, 10**12 + 3]
    vals = sorted({k * k + d for k in ks for d in (-1, 0, 1)} | {0, 1, 2})
    rows = con.execute(
        """
        WITH v(v) AS (SELECT CAST(UNNEST(?) AS HUGEINT)),
        s0 AS (SELECT v, CAST(FLOOR(SQRT(CAST(v AS DOUBLE))) AS HUGEINT) AS s0 FROM v),
        s1 AS (SELECT v, CASE WHEN s0 = 0 THEN 0 ELSE (s0 + v // s0) // 2 END AS s1 FROM s0),
        s2 AS (SELECT v, CASE WHEN s1*s1 > v THEN s1 - 1 ELSE s1 END AS s2 FROM s1)
        SELECT v, CASE WHEN s2*s2 > v THEN s2 - 1 ELSE s2 END AS s FROM s2 ORDER BY v
        """,
        [vals],
    ).fetchall()
    for v, s in rows:
        assert int(s) == math.isqrt(int(v)), (v, s, math.isqrt(int(v)))


def test_distill_long_doc_parity(spark):
    """End-to-end distill parity on a corpus with documents past the
    ~6,700-word bound where E[f1u²] exceeds 2^52 and the old
    FLOOR(SQRT(double)) oracle could diverge from the trainer's
    math.isqrt. The full training replay must stay bit-identical."""
    import random

    from skylogix_real_time_weather_data_pipeline_spark.ext.text import (
        distill_quality_classifier,
    )
    from skylogix_real_time_weather_data_pipeline_spark.plans.ext import _distill_oracle

    rng = random.Random(23)
    rows = []
    for i in range(30):
        if i < 8:  # long docs: 15k-20k words → f1u² ≈ 2-4e16 ≫ 2^52
            n = rng.choice([15_000, 18_000, 20_000])
        else:
            n = rng.choice([30, 50, 75, 120])
        stops = rng.choice([0, 2, 4])
        words = ["the"] * stops + [f"b{rng.randint(0, 9999)}" for _ in range(n - stops)]
        rng.shuffle(words)
        rows.append((i, " ".join(words)))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(map(tuple, distill_quality_classifier(sdf, n_iter=3, lr2=4).collect()))

    import pandas as pd

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    ores = con.execute(_distill_oracle(3, 4))
    ocols = [c[0] for c in ores.description]
    # align column order to the Spark schema before comparing tuples
    orows = sorted(
        tuple(r[ocols.index(c)] for c in
              ("feature", "weight", "train_accuracy", "n_docs", "n_keep"))
        for r in ores.fetchall()
    )
    assert len(out) == 5
    for srow, orow in zip(out, orows):
        assert srow[0] == orow[0]
        assert srow[1] == pytest.approx(float(orow[1]), abs=0), (srow, orow)
        assert srow[2] == pytest.approx(float(orow[2]), abs=0)
        assert (srow[3], srow[4]) == (int(orow[3]), int(orow[4]))
