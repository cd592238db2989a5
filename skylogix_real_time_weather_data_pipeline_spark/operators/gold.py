"""Gold-layer query builders (SURVEY.md §2.5 A1-A12, §2.6 W1-W4).

Every builder returns a lazy DataFrame over the canonical observation schema
(schemas.PROCESSED_WEATHER_SCHEMA column names, overridable for other
datasets). All aggregates are built-in JVM expressions → partial+final hash
aggregation, whole-stage codegen, no Python in the hot path.

Determinism pins (SURVEY §7.4.1): mode tie-break is lexicographic; the
trend label maps sum(change)==0 → 'cooling' exactly like the reference
(src/analyze.py:257); medians/quantiles use exact linear-interpolation
``percentile``/``median`` so a pandas/DuckDB oracle hash-matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fmean folds fixed-point longs so every rounded mean is order-independent
# — at 6-dp rounding across tens of thousands of (date, city) cells, plain
# AVG(double) flips a boundary cell every few runs. fmean stays in
# whole-stage-codegen long arithmetic (functions/exact.py documents the
# 100 TB overflow headroom); dmean remains for callers needing >6 fractional
# digits of per-row fidelity.
from ..functions.exact import dmean, fmean, fmean1, fmean1_round, fmean_round, fsum


def _mean(c: str, scales: dict[str, int] | None):
    """Exact mean fold for a RAW input column: when the caller pins the
    column's decimal scale (inputs exactly representable at that scale —
    plans/weather.py pins temperature 2, humidity 0, wind 3 for the
    testdata mapping), the single-long-sum fmean1 applies; otherwise the
    generic split fmean at scale 6 (quantized for >6-digit inputs). Both
    are exact for in-scale inputs, so pinning a scale never changes the
    value — only the fold cost."""
    if scales and c in scales:
        return fmean1(c, scales[c])
    return fmean(c)


def _mean_round(c: str, scales: dict[str, int] | None, k: int):
    """Display-rounded exact mean (see fmean1_round): the quotient stays
    on the integer grid until the final /10^k, so the rounded value is
    half-away-exact and bit-identical across engines — round(double)
    display means were the last systematically boundary-exposed sites
    after the LM fix."""
    if scales and c in scales:
        return fmean1_round(c, scales[c], k)
    return fmean_round(c, k)


def basic_stats(df: DataFrame, ts: str = "timestamp", temp: str = "temperature",
                humidity: str = "humidity", wind: str = "wind_speed",
                scales: dict[str, int] | None = None) -> DataFrame:
    """A1: global multi-metric aggregate (reference src/analyze.py:146-183).

    One ``agg`` → single partial+final hash-agg pass over the table.
    """
    return df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.min(ts).alias("ts_min"),
        F.max(ts).alias("ts_max"),
        F.round(F.min(temp), 6).alias("temp_min"),
        F.round(F.max(temp), 6).alias("temp_max"),
        _mean_round(temp, scales, 6).alias("temp_mean"),
        F.round(F.expr(f"percentile({temp}, 0.5)"), 6).alias("temp_median"),
        F.round(F.min(humidity), 6).alias("humidity_min"),
        F.round(F.max(humidity), 6).alias("humidity_max"),
        _mean_round(humidity, scales, 6).alias("humidity_mean"),
        F.round(F.min(wind), 6).alias("wind_min"),
        F.round(F.max(wind), 6).alias("wind_max"),
        _mean_round(wind, scales, 6).alias("wind_mean"),
    )


def city_comparison(df: DataFrame, city: str = "city", temp: str = "temperature",
                    humidity: str = "humidity", wind: str = "wind_speed",
                    scales: dict[str, int] | None = None) -> DataFrame:
    """A2/A3: per-city multi-aggregate summary (reference src/analyze.py:185-213,
    src/load.py:188-196). Rounding to 2 mirrors the summary sink (P13)."""
    return df.groupBy(city).agg(
        _mean_round(temp, scales, 2).alias("temp_mean"),
        F.round(F.min(temp), 2).alias("temp_min"),
        F.round(F.max(temp), 2).alias("temp_max"),
        _mean_round(humidity, scales, 2).alias("humidity_mean"),
        _mean_round(wind, scales, 2).alias("wind_mean"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def warmest_coldest(df: DataFrame, city: str = "city", temp: str = "temperature",
                    scales: dict[str, int] | None = None) -> DataFrame:
    """A4/W4: argmax+argmin city by mean temperature (reference
    src/analyze.py:216-218). Tie-break pinned to city name ascending.

    Implemented as rank-1 selection over the (small) per-city aggregate —
    the aggregate shuffles once; the window runs on the tiny result.
    """
    per_city = df.groupBy(city).agg(_mean_round(temp, scales, 6).alias("temp_mean"))
    w_hot = Window.orderBy(F.desc("temp_mean"), F.asc(city))
    w_cold = Window.orderBy(F.asc("temp_mean"), F.asc(city))
    hot = (
        per_city.withColumn("rn", F.row_number().over(w_hot))
        .filter(F.col("rn") == 1)
        .select(F.lit("warmest").alias("label"), F.col(city), F.col("temp_mean"))
    )
    cold = (
        per_city.withColumn("rn", F.row_number().over(w_cold))
        .filter(F.col("rn") == 1)
        .select(F.lit("coldest").alias("label"), F.col(city), F.col("temp_mean"))
    )
    return hot.unionAll(cold)


def daily_city_agg(df: DataFrame, city: str = "city", temp: str = "temperature",
                   date: str = "date",
                   scales: dict[str, int] | None = None) -> DataFrame:
    """A5: two-key (date, city) daily aggregate (reference src/analyze.py:239-243)."""
    return df.groupBy(date, city).agg(
        _mean_round(temp, scales, 6).alias("temp_mean"),
        F.round(F.min(temp), 6).alias("temp_low"),
        F.round(F.max(temp), 6).alias("temp_high"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def condition_histogram(df: DataFrame, condition: str = "weather_condition") -> DataFrame:
    """A6: value_counts of the condition column (reference src/analyze.py:276)."""
    return df.groupBy(condition).agg(F.count(F.lit(1)).alias("n"))


def condition_mode_by_city(df: DataFrame, city: str = "city",
                           condition: str = "weather_condition") -> DataFrame:
    """A7: per-city modal condition (reference src/analyze.py:280-288).

    Portable two-level form: count per (city, condition) → rank-1 by
    (count desc, condition asc). The lexicographic tie-break is pinned
    (pandas breaks ties by first-seen order, which is not reproducible
    distributed — SURVEY §7.4.1c).
    """
    counts = df.groupBy(city, condition).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(city).orderBy(F.desc("n"), F.asc(condition))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(city, F.col(condition).alias("mode_condition"), F.col("n").alias("mode_count"))
    )


def daily_pivot(df: DataFrame, pivot_values: Sequence[str], city: str = "city",
                temp: str = "temperature", date: str = "date",
                scales: dict[str, int] | None = None) -> DataFrame:
    """A8: date rows × city columns of mean temperature (reference
    src/analyze.py:371-374).

    Explicit ``pivot_values`` keeps the plan single-pass and the output
    column order deterministic (SURVEY §7.4.3).
    """
    out = df.groupBy(date).pivot(city, list(pivot_values)).agg(_mean_round(temp, scales, 6))
    # normalize pivot column names in ONE select (chained withColumnRenamed
    # nests a projection per value — O(values) plan depth on wide pivots)
    return out.select(
        date, *[F.col(f"`{v}`").alias(f"c_{str(v).lower()}") for v in pivot_values]
    )


def quantile_summary(df: DataFrame, columns: Sequence[str],
                     quantiles: Sequence[float] = (0.05, 0.25, 0.5, 0.75, 0.95)) -> DataFrame:
    """A9: per-column quantiles, one row per column (reference
    src/transform.py:174-175, src/analyze.py:474 box-plot stats).

    ONE aggregation pass computes every column's full percentile array
    (``percentile(c, array(...))``), then a narrow explode unpivots the
    single result row to (metric, q05..q95) rows. The earlier form ran one
    ``df.agg`` per column unioned together — k metrics = k full scans of
    the table, a real k× at 100 TB; this is one scan regardless of k.
    """
    qlist = ", ".join(repr(float(q)) for q in quantiles)
    one = df.agg(
        *[F.expr(f"percentile({c}, array({qlist}))").alias(f"_q_{c}") for c in columns]
    )
    metric_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("metric"),
                *[
                    F.round(F.element_at(F.col(f"_q_{c}"), i + 1), 6).alias(
                        f"q{int(q * 100):02d}"
                    )
                    for i, q in enumerate(quantiles)
                ],
            )
            for c in columns
        ]
    )
    return one.select(F.explode(metric_structs).alias("m")).select("m.*")


def linear_fit(df: DataFrame, x: str = "temperature", y: str = "humidity",
               scales: dict[str, int] | None = None) -> DataFrame:
    """A10: least-squares deg-1 fit + Pearson r, closed form from aggregates
    (reference src/analyze.py:441-449 ``np.polyfit(x, y, 1)``).

    slope = covar_pop(x,y)/var_pop(x); intercept = avg(y) - slope*avg(x).
    Single aggregation pass; no ML dependency, no iteration.
    """
    # closed form over exact order-independent sums: covar_pop/var_pop/
    # corr merge partial moments in a run-varying order, so their last
    # ulp wobbles; the five sums below are order-independent, and
    # everything after them is scalar double math both engines evaluate
    # identically. When the caller pins both columns' decimal scales
    # (plans/weather.py: temperature 2, humidity 0) the fsum fast path
    # applies — products of scale-kx × scale-ky inputs are exactly
    # representable at kx+ky (magnitude · ulp ≪ half a unit for sensor
    # ranges), so the long-backed fold is value-identical to the decimal
    # fold it replaces (r13, r12 verdict #7) at a fraction of the cost.
    cx, cy = F.col(x), F.col(y)
    if scales and x in scales and y in scales:
        kx, ky = scales[x], scales[y]
        sums = {
            "_sx": fsum(cx, kx), "_sy": fsum(cy, ky),
            "_sxx": fsum(cx * cx, 2 * kx), "_syy": fsum(cy * cy, 2 * ky),
            "_sxy": fsum(cx * cy, kx + ky),
        }
    else:
        def dsx(col):
            return F.sum(col.cast("decimal(28,10)")).cast("double")

        sums = {
            "_sx": dsx(cx), "_sy": dsx(cy),
            "_sxx": dsx(cx * cx), "_syy": dsx(cy * cy),
            "_sxy": dsx(cx * cy),
        }
    agg = df.filter(cx.isNotNull() & cy.isNotNull()).agg(
        *[v.alias(k) for k, v in sums.items()],
        F.count(F.lit(1)).alias("n"),
    )
    n, sx, sy = F.col("n"), F.col("_sx"), F.col("_sy")
    sxx, syy, sxy = F.col("_sxx"), F.col("_syy"), F.col("_sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    pearson = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(pearson, 6).alias("pearson_r"),
        F.col("n"),
    )


def outlier_counts(df: DataFrame, bounds: dict[str, tuple[float, float]]) -> DataFrame:
    """A11: per-column out-of-bounds counts in ONE pass (reference
    src/transform.py:180-182 counts while cleaning)."""
    aggs = [
        F.sum(
            F.when((F.col(c) < lo) | (F.col(c) > hi), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"{c}_outliers")
        for c, (lo, hi) in bounds.items()
    ]
    return df.agg(*aggs)


def exact_median(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """A12: exact per-column median (reference src/transform.py:188,
    src/analyze.py:169). Exact ``percentile`` matches pandas interpolation."""
    return df.agg(
        *[F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias(f"{c}_median") for c in columns]
    )


def temperature_trends(df: DataFrame, city: str = "city", temp: str = "temperature",
                       date: str = "date",
                       scales: dict[str, int] | None = None) -> DataFrame:
    """W1+W2: per-city daily temperature change series → trend summary
    (reference src/analyze.py:246-258).

    Stage 1 collapses to one row per (city, day) — the shuffle is on the
    small aggregated set. Stage 2 is a lag window per city ordered by day.
    Label semantics preserved verbatim: sum(change) > 0 → 'warming',
    else (including exactly 0) → 'cooling' (SURVEY §7.4.1d).

    Determinism pin: the daily mean is an exact fixed-point fold (fmean),
    not AVG(double) — float partial-agg fold order varies run to run, and
    every daily mean feeds ~27 downstream diffs here, so a last-ulp wobble
    at a 6-decimal rounding boundary flipped one output cell in ~1 of 10
    local sweeps under the old AVG. The exact fold is order-independent;
    stage 2 then runs in sorted per-city partitions, so the whole query is
    bit-stable. (Was DECIMAL(20,10)/DECIMAL(24,10) sums in r3 — fsum keeps
    the same exactness on the long-backed codegen path, functions/exact.py.)
    """
    daily = df.groupBy(city, date).agg(_mean(temp, scales).alias("t"))
    w = Window.partitionBy(city).orderBy(date)
    delta = daily.withColumn("change", F.col("t") - F.lag("t", 1).over(w))
    return (
        delta.filter(F.col("change").isNotNull())
        .groupBy(city)
        .agg(
            fmean_round("change", 6).alias("avg_change"),
            F.round(F.max("change"), 6).alias("max_change"),
            F.round(F.min("change"), 6).alias("min_change"),
            F.round(fsum("change", 6), 6).alias("sum_change"),
        )
        .withColumn(
            "trend",
            F.when(F.col("sum_change") > 0, F.lit("warming")).otherwise(F.lit("cooling")),
        )
    )


def zscore_anomalies(df: DataFrame, value: str = "temperature", city: str = "city",
                     threshold: float = 2.5,
                     scales: dict[str, int] | None = None) -> DataFrame:
    """Per-city z-score anomaly detection: observations more than
    ``threshold`` sample standard deviations from their city's mean.

    Two-pass robust pattern at scale: pass 1 collapses to O(cities) stats
    (one map-side-combinable agg); pass 2 broadcasts those 150 rows back
    over the raw stream — the fact side never shuffles. Mean/std are
    ROUNDED before the z computation and the z is rounded before the
    threshold test, so engine last-ulp summation differences can't flip a
    boundary row (same pinning policy as the LSH cosine thresholds).
    """
    # mean and stddev from exact order-independent sums (sum,
    # sum-of-squares): the built-in stddev_samp merges partial moments in
    # run-varying order and its 6-dp rounding gates the anomaly filter.
    # No cancellation hazard: sxx and sx²/n are the same magnitude only
    # when variance ≈ 0, and a zero-variance city has no anomalies by
    # definition. A pinned input scale takes the fsum fast path (exact
    # for the square at 2× the scale — see linear_fit); unpinned inputs
    # keep the decimal fold.
    c = F.col(value)
    if scales and value in scales:
        k = scales[value]
        _sx_agg = fsum(c, k).alias("_sx")
        _sxx_agg = fsum(c * c, 2 * k).alias("_sxx")
    else:
        _sx_agg = F.sum(c.cast("decimal(28,10)")).cast("double").alias("_sx")
        _sxx_agg = (
            F.sum((c * c).cast("decimal(28,10)")).cast("double").alias("_sxx")
        )
    moments = df.groupBy(city).agg(
        _sx_agg, _sxx_agg, F.count(value).alias("_n"),
    )
    _n, _sx, _sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    stats = moments.select(
        city,
        F.round(_sx / _n, 6).alias("_mean"),
        F.round(F.sqrt((_sxx - _sx * _sx / _n) / (_n - 1)), 6).alias("_std"),
    )
    z = F.round((F.col(value) - F.col("_mean")) / F.col("_std"), 6)
    return (
        df.join(F.broadcast(stats), city)
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= threshold)
        .select(
            city,
            "event_id",
            F.col("timestamp"),
            F.round(value, 6).alias(value),
            F.col("_mean").alias("city_mean"),
            F.col("_std").alias("city_std"),
            "zscore",
        )
    )
