"""Named query plans for the driver contract (__spark_entry__.py).

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet tables). Keys are disjoint across submodules; __spark_entry__ merges
them.
"""

from . import ext, relational, sql_surface, streaming_batch, weather  # noqa: F401

_MODULES = (weather, relational, ext, streaming_batch, sql_surface)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
