"""Named query plans for the driver contract (__spark_entry__.py).

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet tables). Keys are disjoint across submodules; __spark_entry__ merges
them.
"""

from . import ext, relational, streaming_batch, weather  # noqa: F401


def all_queries():
    out = {}
    for mod in (weather, relational, ext, streaming_batch):
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in (weather, relational, ext, streaming_batch):
        out.update(mod.ORACLES)
    return out
