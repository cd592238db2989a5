"""Registry-wide oracle TYPE lint (round-5 verdict item #2).

The round-5 postmortem: ``events_cumulative_users`` was value-identical on
both engines but red under the driver's typed hash, because the oracle's
outer ``SUM(new_users) OVER (...)`` was the one aggregate not wrapped in
``CAST(... AS BIGINT)`` — DuckDB types it HUGEINT where Spark says bigint.
``fetchall`` converts HUGEINT to a plain Python int, so a repr-level
comparison (the old scripts/local_verify.py) could never see it. The fix
class is structural: lint the DECLARED DuckDB result types of every oracle.

DuckDB relation binding is lazy (``con.sql(sql).types`` plans without
executing), so this sweeps all ~150 oracles in well under a second.
"""

from __future__ import annotations

import duckdb
import pytest

from skylogix_real_time_weather_data_pipeline_spark.plans import all_oracles

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Queries whose SPARK side intentionally returns decimal columns, so a
# DuckDB DECIMAL output is correct there. Currently empty: even
# rel_product_profit (which folds in decimal internally) rounds to double
# on both engines before returning.
DECIMAL_ALLOWED: dict[str, set[str]] = {}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_hugeint_or_stray_decimal_in_any_oracle(con):
    """Every oracle must bind with no HUGEINT output column ever (Spark has
    no int128 — a HUGEINT always means an uncast SUM over BIGINT), and no
    DECIMAL output column outside the explicit allowlist (uncast decimal
    literal arithmetic, e.g. ``x * 50.0``, is the other way a
    value-identical result diverges under a typed hash)."""
    offenders = []
    for name, sql in all_oracles().items():
        rel = con.sql(sql)  # binds (types resolved), does not execute
        for col, typ in zip(rel.columns, [str(t).upper() for t in rel.types]):
            if "HUGEINT" in typ:
                offenders.append((name, col, typ))
            elif typ.startswith("DECIMAL") and col not in DECIMAL_ALLOWED.get(name, set()):
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle output columns with driver-hash-diverging types "
        f"(wrap in CAST(... AS BIGINT/DOUBLE)): {offenders}"
    )


def test_all_oracles_bind(con):
    """Every oracle parses and binds against the sf0.001 views — catches
    SQL typos without paying execution cost."""
    errs = []
    for name, sql in all_oracles().items():
        try:
            con.sql(sql)
        except Exception as exc:  # noqa: BLE001
            errs.append((name, str(exc)[:200]))
    assert not errs, errs


def test_local_verify_catches_the_r5_red_row(con):
    """Regression: the PRE-fix cumulative_users oracle (no outer CAST) must
    now be flagged by scripts/local_verify.py's canonical type mapping,
    proving the local harness is no longer strictly weaker than the
    driver's typed hash for this drift class."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from local_verify import canon_duck_type, canon_spark_type, type_mismatches

    pre_fix = """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ), daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_users
    FROM daily
    """
    rel = con.sql(pre_fix)
    types = [str(t) for t in rel.types]
    assert canon_duck_type(types[rel.columns.index("cum_users")]) == "hugeint"
    spark_dtypes = [("day", "date"), ("new_users", "bigint"), ("cum_users", "bigint")]
    mism = type_mismatches(spark_dtypes, rel.columns, types)
    assert mism == [("cum_users", "int", "hugeint")]

    # and the POST-fix registry oracle is clean
    post = con.sql(all_oracles()["events_cumulative_users"])
    assert not type_mismatches(
        spark_dtypes, post.columns, [str(t) for t in post.types]
    )

    # sanity on the canonicalizer itself
    assert canon_spark_type("bigint") == canon_duck_type("INTEGER") == "int"
    assert canon_spark_type("double") == canon_duck_type("FLOAT") == "float"
    assert canon_duck_type("DECIMAL(13,1)") == "decimal(13,1)"
    assert canon_spark_type("array<double>") == canon_duck_type("DOUBLE[]")
