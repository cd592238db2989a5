"""Named query plans for the driver contract (__spark_entry__.py).

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet tables). Keys are disjoint across submodules; __spark_entry__ merges
them.
"""

from . import ext, relational, sql_surface, streaming_batch, weather  # noqa: F401

_MODULES = (weather, relational, ext, streaming_batch, sql_surface)

#: The driver's correctness harness checks the FIRST 50 queries() entries in
#: insertion order (CORRECTNESS_r01 contains exactly positions 0-49 of the
#: r01 ordering). Keys listed here are emitted first so queries that have
#: not yet appeared in a driver CORRECTNESS file get verified this round;
#: everything else follows in module order. Rotate per round as needed.
_VERIFY_FIRST = (
    # never driver-verified as of r01 (positions 50-55 of the r01 order)
    "stream_range_join_windows",
    "stream_sliding_6h",
    "stream_sessionize",
    "stream_dedup_keyed",
    "sql_forecast_revenue",
    "sql_priority_with_exists",
    # new in round 2
    "docs_dedup_clusters",
    "docs_pii_scrub",
    "docs_top_ngrams",
)


def _merged(attr):
    out = {}
    for mod in _MODULES:
        out.update(getattr(mod, attr))
    first = {k: out[k] for k in _VERIFY_FIRST if k in out}
    first.update(out)
    return first


def all_queries():
    return _merged("QUERIES")


def all_oracles():
    return _merged("ORACLES")
