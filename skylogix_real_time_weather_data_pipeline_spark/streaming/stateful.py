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


def running_key_stats(stream: DataFrame, key_col: str, value_col: str,
                      n_buckets: int | None = 1024) -> DataFrame:
    """Per-key running stats over a stream. Input needs (key_col,
    value_col); output one row per touched key per micro-batch with
    cumulative stats.

    DEFAULT POSTURE (r14, r13 verdict #5): state is BUCKETED —
    :func:`running_key_stats_bucketed` with ``n_buckets`` groups — not
    per-key. The two are row-identical (pytest-pinned equivalence,
    including NULL/sentinel keys), but at high key cardinality the
    per-key form pays one Python invocation + one state-store put PER
    KEY per batch: the r13 RocksDB probe measured 147 s vs 7.75 s
    bucketed at 1M keys (19×, SCALING_r13 streaming_state_rocksdb), and
    the bucketed growth curve is 1.53×/decade vs 7.59×. Pass
    ``n_buckets=None`` (or call :func:`running_key_stats_perkey`) for
    the point-put granularity — right only when batches touch few keys
    and buckets would write-amplify."""
    if n_buckets is not None:
        return running_key_stats_bucketed(stream, key_col, value_col,
                                          n_buckets=n_buckets)
    return running_key_stats_perkey(stream, key_col, value_col)


def running_key_stats_perkey(stream: DataFrame, key_col: str,
                             value_col: str) -> DataFrame:
    """Per-KEY state granularity of :func:`running_key_stats` — one state
    row and one store put per key. Kept for sparse-touch workloads and as
    the A/B reference the scaling probe measures against."""
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


BUCKET_STATS_STATE_SCHEMA = (
    "keys array<string>, ns array<bigint>, totals array<double>, "
    "vmins array<double>, vmaxs array<double>"
)

#: NULL keys ride the bucketed path as this sentinel: pandas' groupby
#: would silently DROP the None group (dropna defaults True) and a None
#: key cannot live in the string-array state, so the encode happens
#: Spark-side and the emit decodes back to None — keeping row equality
#: with the per-key operator, whose Spark groupBy keeps the null group
#: (r8 review finding). A GENUINE key may contain any bytes, including
#: this literal, so real keys starting with \x00 are escaped with one
#: extra \x00 prefix before bucketing and unescaped on emit (r8 advisor):
#: the encoding is a bijection — NULL ↔ the bare sentinel, "\x00..." ↔
#: "\x00\x00...", everything else ↔ itself.
_NULL_KEY = "\x00null"


def _update_bucket(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    import numpy as np

    # ALL key hashing below runs on BYTES, not str: pandas' object-dtype
    # string hash table compares keys as C strings, so two str keys that
    # differ only past an embedded NUL byte ("x\x00a" vs "x\x00b" — or the
    # \x00-escaped sentinel forms) silently MERGE in groupby/unique/
    # reindex. bytes objects hash over their full buffer. Keys decode back
    # to str only at the state write and the emit.
    if state.exists:
        ks, ns, ts, mns, mxs = state.get
        st = pd.DataFrame(
            {"n": ns, "total": ts, "vmin": mns, "vmax": mxs},
            index=pd.Index([k.encode("utf-8") for k in ks], name="key"),
        )
    else:
        st = pd.DataFrame(
            {"n": pd.Series(dtype="int64"), "total": pd.Series(dtype="float64"),
             "vmin": pd.Series(dtype="float64"), "vmax": pd.Series(dtype="float64")},
            index=pd.Index([], name="key"),
        )
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch["key"] = batch["key"].str.encode("utf-8")
    agg = (
        batch.dropna(subset=["value"])
        .groupby("key")["value"]
        .agg(bn="count", btotal="sum", bmin="min", bmax="max")
    )
    # touched = every key present in the batch (all-null-value keys too —
    # the per-key operator also emits for them), aligned with prior state
    touched = pd.Index(batch["key"].unique(), name="key")
    m = st.join(agg, how="outer")
    # a touched key whose batch rows are ALL null never enters agg — it
    # must still get (empty) state and an output row, like the per-key op
    m = m.reindex(m.index.union(touched))
    m["n"] = m["n"].fillna(0).astype("int64") + m["bn"].fillna(0).astype("int64")
    m["total"] = m["total"].fillna(0.0) + m["btotal"].fillna(0.0)
    m["vmin"] = np.fmin(m["vmin"], m["bmin"])
    m["vmax"] = np.fmax(m["vmax"], m["bmax"])
    m = m.drop(columns=["bn", "btotal", "bmin", "bmax"]).sort_index()
    state.update((
        [k.decode("utf-8") for k in m.index], list(m["n"]), list(m["total"]),
        list(m["vmin"]), list(m["vmax"]),
    ))
    out = m.loc[m.index.intersection(touched)].reset_index()
    out["key"] = out["key"].str.decode("utf-8")
    out["mean"] = out["total"] / out["n"].where(out["n"] > 0)
    # decode the NULL-key sentinel and the \x00 escape (see
    # running_key_stats_bucketed): the bare sentinel becomes key=None
    # exactly like the per-key operator; any other \x00-prefixed key had
    # one escape \x00 prepended Spark-side — strip it
    is_null = out["key"] == _NULL_KEY
    escaped = out["key"].str.startswith("\x00", na=False) & ~is_null
    out.loc[escaped, "key"] = out.loc[escaped, "key"].str[1:]
    out.loc[is_null, "key"] = None
    yield out[["key", "n", "total", "vmin", "vmax", "mean"]]


def running_key_stats_bucketed(stream: DataFrame, key_col: str,
                               value_col: str,
                               n_buckets: int = 1024) -> DataFrame:
    """:func:`running_key_stats` with BUCKETED state granularity — the fix
    for the r7 probe's finding that the per-key form's update path
    dominates wall-clock at high key cardinality (SCALING_r07
    ``streaming_state_rocksdb``: 1M keys → update_ms 2.05M vs commit_ms
    1.5k). The cost there is not RocksDB: ``applyInPandasWithState``
    invokes the Python function once per GROUP, so per-key state means a
    million Python calls per batch, each building a one-row pandas frame
    and paying its own Arrow round-trip and state-store put.

    Here state is keyed by ``pmod(xxhash64(key), n_buckets)`` and each
    bucket stores its keys' stats as parallel arrays; one Python call per
    TOUCHED BUCKET merges the whole bucket's batch slice vectorized
    (pandas groupby + np.fmin/fmax) and emits one row per touched key —
    the same output contract as the per-key form (equivalence is
    pytest-pinned). Python invocations drop from |keys| to ≤ n_buckets
    per batch and the state store sees n_buckets puts of array blobs
    instead of |keys| point puts.

    Trade-off, stated: a batch touching few keys still rewrites each
    touched bucket's whole array (~|keys|/n_buckets entries). Size
    ``n_buckets`` so a bucket holds 100–1000 keys: large enough to
    amortize the Python/Arrow/put overhead, small enough that write
    amplification on sparse batches stays bounded. For mostly-dense
    batches (the profile-store shape) bucketing is strictly better."""
    from pyspark.sql import functions as F

    raw = F.col(key_col).cast("string")
    key_str = F.coalesce(
        # escape real keys that collide with the sentinel's \x00 prefix
        # (incl. a genuine "\x00null"): one extra \x00, stripped on emit
        F.when(raw.startswith("\x00"), F.concat(F.lit("\x00"), raw))
        .otherwise(raw),
        F.lit(_NULL_KEY),
    )
    src = stream.select(
        F.pmod(F.xxhash64(key_str), F.lit(n_buckets))
        .cast("int").alias("bucket"),
        key_str.alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("bucket").applyInPandasWithState(
        _update_bucket,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PAIR_OUTPUT_SCHEMA = "id_a bigint, id_b bigint"
BUCKET_STATE_SCHEMA = "ids array<bigint>"


def streaming_minhash_pairs(stream: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n_hashes: int = 16,
                            bands: int = 4, shingle_n: int = 3,
                            max_bucket_size: int = 100_000) -> DataFrame:
    """Incremental MinHash-LSH near-dup candidate pairs over a stream.

    The banding stage is the per-row expression form
    (``ext.dedup.minhash_bands_rowwise`` — bit-identical band hashes to the
    batch pipeline, no global groupBy); pair generation holds each LSH
    bucket's member list in ``applyInPandasWithState`` keyed by
    (band_idx, band_hash). Every micro-batch emits exactly the NEW pairs —
    new×old and new×new members of each touched bucket — so the union of
    all emissions equals the batch ``minhash_lsh_pairs`` candidate set on
    the same data (pytest-pinned equivalence across micro-batches).

    State per bucket is the member id array — bounded by duplicate-cluster
    density like the batch bucket arrays; once a bucket exceeds
    ``max_bucket_size`` it stops emitting and stops growing (the batch path
    drops such buckets entirely — both reject the degenerate mass-duplicate
    case, the streaming path without retracting already-emitted pairs).
    Output pairs can repeat across micro-batches only if the same pair
    collides in several bands; downstream dedup/clustering is
    idempotent to that (same as the batch n_band_collisions grouping).
    """
    from ..ext.dedup import minhash_bands_rowwise

    banded = minhash_bands_rowwise(stream, text_col, id_col, n_hashes, bands, shingle_n)

    def _emit(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        old = list(state.get[0]) if state.exists else []
        seen = set(old)
        if len(seen) > max_bucket_size:
            return
        new = sorted({int(i) for pdf in pdfs for i in pdf[id_col]} - seen)
        if not new:
            return
        pairs_a, pairs_b = [], []
        for b in new:
            for a in old:
                lo, hi = (a, b) if a < b else (b, a)
                pairs_a.append(lo)
                pairs_b.append(hi)
        for i, a in enumerate(new):
            for b in new[i + 1:]:
                pairs_a.append(a)
                pairs_b.append(b)
        state.update((sorted(seen | set(new)),))
        if pairs_a:
            yield pd.DataFrame({"id_a": pairs_a, "id_b": pairs_b})

    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _emit,
        outputStructType=PAIR_OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_key_stats_tws(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """``running_key_stats`` on Spark 4's ``transformWithStateInPandas`` —
    the successor stateful API (typed state handles, timers, TTL support;
    requires the RocksDB state store provider). Same contract as the
    applyInPandasWithState form: one row per touched key per micro-batch
    with cumulative (n, total, vmin, vmax, mean); equivalence across the
    two APIs is pinned in tests/test_stateful.py.

    ENVIRONMENT GATE: Spark's TWS Python runner imports protobuf, which is
    not installed in this container — the equivalence test importorskips
    in that case (same policy as the Kafka transport). The operator itself
    is complete and runs wherever `google.protobuf` is available.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total, vmin, vmax = (
                self._state.get() if self._state.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                vals = pdf["value"].dropna()
                if len(vals):
                    n += int(len(vals))
                    total += float(vals.sum())
                    bmin, bmax = float(vals.min()), float(vals.max())
                    vmin = bmin if vmin is None else min(vmin, bmin)
                    vmax = bmax if vmax is None else max(vmax, bmax)
            self._state.update((n, total, vmin, vmax))
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

        def close(self) -> None:
            pass

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").transformWithStateInPandas(
        _RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
