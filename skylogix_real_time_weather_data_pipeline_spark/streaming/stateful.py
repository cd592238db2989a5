"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 extension surface: arbitrary per-key state beyond built-in
windows/dedup).

``running_key_stats`` maintains per-key incremental statistics
(count / sum / min / max → mean) across micro-batches. State is four
doubles per key — constant-size regardless of stream length — stored in
the state store (RocksDB-backed on real clusters). Each micro-batch emits
the keys it touched with their updated totals (update semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n bigint, total double, vmin double, vmax double, mean double"
STATE_SCHEMA = "n bigint, total double, vmin double, vmax double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total, vmin, vmax = (state.get if state.exists else (0, 0.0, None, None))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        if len(vals):
            n += int(len(vals))
            total += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
    state.update((n, total, vmin, vmax))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n": [n],
            "total": [total],
            "vmin": [vmin],
            "vmax": [vmax],
            "mean": [total / n if n else None],
        }
    )


def running_key_stats(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running stats over a stream. Input needs (key_col, value_col);
    output one row per touched key per micro-batch with cumulative stats."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
