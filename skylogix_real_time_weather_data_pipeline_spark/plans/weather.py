"""Weather-pipeline parity queries (SURVEY.md §2) over the driver testdata.

Per FIXTURES.md §3 role mapping, the ``events`` table stands in for the
observation stream: ``user_id`` → station/city key, ``value`` →
temperature, ``event_type`` → weather condition, ``ts`` → observation
timestamp, and ``props.k`` (JSON) → humidity. Every query here is the
Spark-first expression of a §2 operator, paired with a DuckDB oracle.

Scale notes: the obs view is a pure projection (no shuffle); every
aggregate below shuffles exactly once on its grouping key; rank-1
selections window over already-aggregated (small) intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    celsius_to_fahrenheit,
    format_timestamp,
    iso_format,
    weather_icon,
)
from ..functions.exact import fmean1, fmean1_round, fmean_round, sql_fmean, sql_fmean1, sql_fmean1_round, sql_fmean_round, sql_fsum

#: dataset-true decimal scales of the observation metrics (value is exact
#: 2-dp, props.k an integer, wind = value/10 exact 3-dp) — pins the gold
#: mean folds to the single-long-sum path; values are identical to the
#: generic scale-6 fold (both exact), only the per-row cost drops
_OBS_SCALES = {"temperature": 2, "humidity": 0, "wind_speed": 3}
from ..operators import gold, silver

#: pinned pivot/condition domain (explicit values → single-pass pivot,
#: deterministic column order; SURVEY §7.4.3)
CONDITIONS = ["click", "error", "purchase", "signup", "view"]


#: plan cache (same contract as sources.batch._TABLE_CACHE): every weather
#: query starts from this projection, so rebuilding its ~12-column py4j
#: expression tree per driver/bench call is pure chatter — the plan is
#: immutable and session-keyed.
_OBS_CACHE: dict[tuple[str, str], DataFrame] = {}


def observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical observation view over events.parquet.

    Pure narrow projection — Catalyst pushes the column pruning into the
    parquet scan (only 6 of 6 columns actually referenced downstream are
    read; queries touching fewer prune further).
    """
    from ..sources import load_table

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _OBS_CACHE.get(key)
    if cached is not None:
        return cached
    events = load_table(spark, sf_dir, "events")
    obs = events.select(
        F.col("event_id"),
        F.col("user_id").cast("string").alias("city"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("temperature"),
        F.get_json_object("props", "$.k").cast("double").alias("humidity"),
        (F.col("value") / 10.0).alias("wind_speed"),
        F.col("event_type").alias("weather_condition"),
        F.to_date("ts").alias("date"),
        F.hour("ts").alias("hour"),
        F.date_format("ts", "EEEE").alias("day_of_week"),
    )
    _OBS_CACHE[key] = obs
    return obs


#: DuckDB mirror of ``observations`` — prefix for every oracle below.
OBS_CTE = """
WITH obs AS (
  SELECT event_id,
         CAST(user_id AS VARCHAR)                         AS city,
         ts                                               AS "timestamp",
         value                                            AS temperature,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS humidity,
         value / 10.0                                     AS wind_speed,
         event_type                                       AS weather_condition,
         CAST(ts AS DATE)                                 AS "date",
         CAST(hour(ts) AS INTEGER)                        AS "hour",
         dayname(ts)                                      AS day_of_week
  FROM events
)
"""


# --------------------------------------------------------------------------
# A1 — global multi-metric aggregate
# --------------------------------------------------------------------------

def q_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.basic_stats(observations(spark, sf_dir), scales=_OBS_SCALES)


O_BASIC_STATS = OBS_CTE + f"""
SELECT CAST(COUNT(*) AS BIGINT)                       AS total_records,
       MIN("timestamp")                               AS ts_min,
       MAX("timestamp")                               AS ts_max,
       ROUND(MIN(temperature), 6)                     AS temp_min,
       ROUND(MAX(temperature), 6)                     AS temp_max,
       {sql_fmean1_round('temperature', 2, 6)} AS temp_mean,
       ROUND(quantile_cont(temperature, 0.5), 6)      AS temp_median,
       ROUND(MIN(humidity), 6)                        AS humidity_min,
       ROUND(MAX(humidity), 6)                        AS humidity_max,
       {sql_fmean1_round('humidity', 0, 6)} AS humidity_mean,
       ROUND(MIN(wind_speed), 6)                      AS wind_min,
       ROUND(MAX(wind_speed), 6)                      AS wind_max,
       {sql_fmean1_round('wind_speed', 3, 6)} AS wind_mean
FROM obs
"""


# --------------------------------------------------------------------------
# A2/A3 — per-city comparison summary
# --------------------------------------------------------------------------

def q_city_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.city_comparison(observations(spark, sf_dir), scales=_OBS_SCALES)


O_CITY_COMPARISON = OBS_CTE + f"""
SELECT city,
       {sql_fmean1_round('temperature', 2, 2)} AS temp_mean,
       ROUND(MIN(temperature), 2) AS temp_min,
       ROUND(MAX(temperature), 2) AS temp_max,
       {sql_fmean1_round('humidity', 0, 2)} AS humidity_mean,
       {sql_fmean1_round('wind_speed', 3, 2)} AS wind_mean,
       CAST(COUNT(*) AS BIGINT)   AS n_obs
FROM obs GROUP BY city
"""


# --------------------------------------------------------------------------
# A4/W4 — warmest / coldest city (rank-1 selections)
# --------------------------------------------------------------------------

def q_warmest_coldest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.warmest_coldest(observations(spark, sf_dir), scales=_OBS_SCALES)


O_WARMEST_COLDEST = OBS_CTE + f"""
, per_city AS (
  SELECT city, {sql_fmean1_round('temperature', 2, 6)} AS temp_mean FROM obs GROUP BY city
)
SELECT 'warmest' AS label, city, temp_mean FROM (
  SELECT city, temp_mean,
         row_number() OVER (ORDER BY temp_mean DESC, city ASC) AS rn FROM per_city
) WHERE rn = 1
UNION ALL
SELECT 'coldest' AS label, city, temp_mean FROM (
  SELECT city, temp_mean,
         row_number() OVER (ORDER BY temp_mean ASC, city ASC) AS rn FROM per_city
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# A5 — two-key (date, city) daily aggregate
# --------------------------------------------------------------------------

def q_daily_city_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.daily_city_agg(observations(spark, sf_dir), scales=_OBS_SCALES)


O_DAILY_CITY_AGG = OBS_CTE + f"""
SELECT "date", city,
       {sql_fmean1_round('temperature', 2, 6)} AS temp_mean,
       ROUND(MIN(temperature), 6) AS temp_low,
       ROUND(MAX(temperature), 6) AS temp_high,
       CAST(COUNT(*) AS BIGINT)   AS n_obs
FROM obs GROUP BY "date", city
"""


# --------------------------------------------------------------------------
# A6 — condition histogram (value_counts)
# --------------------------------------------------------------------------

def q_condition_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.condition_histogram(observations(spark, sf_dir))


O_CONDITION_HISTOGRAM = OBS_CTE + """
SELECT weather_condition, CAST(COUNT(*) AS BIGINT) AS n FROM obs GROUP BY weather_condition
"""


# --------------------------------------------------------------------------
# A7 — per-city modal condition (lexicographic tie-break)
# --------------------------------------------------------------------------

def q_condition_mode_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.condition_mode_by_city(observations(spark, sf_dir))


O_CONDITION_MODE = OBS_CTE + """
, counts AS (
  SELECT city, weather_condition, CAST(COUNT(*) AS BIGINT) AS n
  FROM obs GROUP BY city, weather_condition
)
SELECT city, weather_condition AS mode_condition, n AS mode_count FROM (
  SELECT city, weather_condition, n,
         row_number() OVER (PARTITION BY city ORDER BY n DESC, weather_condition ASC) AS rn
  FROM counts
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# A8 — pivot: date × condition mean temperature (explicit value list)
# --------------------------------------------------------------------------

def q_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.daily_pivot(observations(spark, sf_dir), CONDITIONS, city="weather_condition", scales=_OBS_SCALES)


_pivot_cols = ",\n       ".join(
    "ROUND(%s, 6) AS c_%s"
    % (sql_fmean1(f"CASE WHEN weather_condition = '{c}' THEN temperature END", 2), c)
    for c in CONDITIONS
)
O_DAILY_PIVOT = OBS_CTE + f"""
SELECT "date",
       {_pivot_cols}
FROM obs GROUP BY "date"
"""


# --------------------------------------------------------------------------
# A9 — per-metric quantile summary
# --------------------------------------------------------------------------

_Q_METRICS = ["temperature", "humidity", "wind_speed"]


def q_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.quantile_summary(observations(spark, sf_dir), _Q_METRICS)


O_QUANTILE_SUMMARY = OBS_CTE + "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS metric,
       ROUND(quantile_cont({c}, 0.05), 6) AS q05,
       ROUND(quantile_cont({c}, 0.25), 6) AS q25,
       ROUND(quantile_cont({c}, 0.50), 6) AS q50,
       ROUND(quantile_cont({c}, 0.75), 6) AS q75,
       ROUND(quantile_cont({c}, 0.95), 6) AS q95
FROM obs"""
    for c in _Q_METRICS
)


# --------------------------------------------------------------------------
# A10 — least-squares linear fit humidity ~ temperature (closed form)
# --------------------------------------------------------------------------

def q_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.linear_fit(observations(spark, sf_dir), x="temperature",
                           y="humidity", scales=_OBS_SCALES)


O_LINEAR_FIT = OBS_CTE + f"""
SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS pearson_r,
       CAST(n AS BIGINT) AS n
FROM (
  -- exact fixed-point folds mirror gold.linear_fit's fsum fast path
  -- (r13, was DECIMAL(28,10); scales pinned by _OBS_SCALES — products
  -- exact at the sum of the input scales)
  SELECT {sql_fsum('temperature', 2)} AS sx,
         {sql_fsum('humidity', 0)} AS sy,
         {sql_fsum('temperature * temperature', 4)} AS sxx,
         {sql_fsum('humidity * humidity', 0)} AS syy,
         {sql_fsum('temperature * humidity', 2)} AS sxy,
         COUNT(*) AS n
  FROM obs WHERE temperature IS NOT NULL AND humidity IS NOT NULL
)
"""


# --------------------------------------------------------------------------
# A11 — out-of-bounds counts (single pass, count_if style)
# --------------------------------------------------------------------------

_BOUNDS = {"temperature": (10.0, 150.0), "humidity": (5.0, 95.0)}


def q_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.outlier_counts(observations(spark, sf_dir), _BOUNDS)


O_OUTLIER_COUNTS = OBS_CTE + """
SELECT CAST(SUM(CASE WHEN temperature < 10.0 OR temperature > 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS temperature_outliers,
       CAST(SUM(CASE WHEN humidity < 5.0 OR humidity > 95.0 THEN 1 ELSE 0 END) AS BIGINT) AS humidity_outliers
FROM obs
"""


# --------------------------------------------------------------------------
# A12 — exact medians
# --------------------------------------------------------------------------

def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.exact_median(observations(spark, sf_dir), ["temperature", "humidity", "wind_speed"])


O_EXACT_MEDIAN = OBS_CTE + """
SELECT ROUND(quantile_cont(temperature, 0.5), 6) AS temperature_median,
       ROUND(quantile_cont(humidity, 0.5), 6)    AS humidity_median,
       ROUND(quantile_cont(wind_speed, 0.5), 6)  AS wind_speed_median
FROM obs
"""


# --------------------------------------------------------------------------
# W1/W2 — per-city lag-diff trend summary ('warming'/'cooling')
# --------------------------------------------------------------------------

def q_temperature_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.temperature_trends(observations(spark, sf_dir), scales=_OBS_SCALES)


O_TEMPERATURE_TRENDS = OBS_CTE + f"""
, daily AS (
  -- exact fixed-point fold mirrors the engine's order-independent daily mean
  SELECT city, "date", {sql_fmean1('temperature', 2)} AS t
  FROM obs GROUP BY city, "date"
), delta AS (
  SELECT city, t - lag(t) OVER (PARTITION BY city ORDER BY "date") AS change FROM daily
)
SELECT city,
       {sql_fmean_round('change', 6)} AS avg_change,
       ROUND(MAX(change), 6) AS max_change,
       ROUND(MIN(change), 6) AS min_change,
       ROUND({sql_fsum('change', 6)}, 6) AS sum_change,
       CASE WHEN ROUND({sql_fsum('change', 6)}, 6) > 0
            THEN 'warming' ELSE 'cooling' END AS trend
FROM delta WHERE change IS NOT NULL GROUP BY city
"""


# --------------------------------------------------------------------------
# P10/P11 + F1/F3/F9 — derived projection (row-level, no shuffle)
# --------------------------------------------------------------------------

def q_derived_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = observations(spark, sf_dir)
    return obs.select(
        "event_id",
        "date",
        "hour",
        "day_of_week",
        F.round(celsius_to_fahrenheit("temperature"), 6).alias("temp_f"),
        format_timestamp("timestamp").alias("ts_formatted"),
        iso_format("timestamp").alias("ts_iso"),
    )


O_DERIVED_PROJECTION = OBS_CTE + """
SELECT event_id, "date", "hour", day_of_week,
       ROUND(temperature * 9.0 / 5.0 + 32.0, 6)      AS temp_f,
       strftime("timestamp", '%Y-%m-%d %H:%M:%S')    AS ts_formatted,
       strftime("timestamp", '%Y-%m-%dT%H:%M:%S')    AS ts_iso
FROM obs
"""


# --------------------------------------------------------------------------
# F5 — icon map lookup (MapType literal, default path)
# --------------------------------------------------------------------------

def q_icon_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = observations(spark, sf_dir)
    return (
        obs.withColumn("icon", weather_icon("weather_condition"))
        .groupBy("weather_condition", "icon")
        .agg(F.count(F.lit(1)).alias("n"))
    )


O_ICON_LOOKUP = OBS_CTE + """
SELECT weather_condition,
       CASE weather_condition
            WHEN 'Clear' THEN '☀️' WHEN 'Clouds' THEN '☁️' WHEN 'Rain' THEN '🌧️'
            WHEN 'Drizzle' THEN '🌦️' WHEN 'Thunderstorm' THEN '⛈️' WHEN 'Snow' THEN '❄️'
            WHEN 'Mist' THEN '🌫️' WHEN 'Smoke' THEN '🌫️' WHEN 'Haze' THEN '🌫️'
            WHEN 'Dust' THEN '🌫️' WHEN 'Fog' THEN '🌫️' WHEN 'Sand' THEN '🌫️'
            WHEN 'Ash' THEN '🌫️' WHEN 'Squall' THEN '💨' WHEN 'Tornado' THEN '🌪️'
            ELSE '❓' END AS icon,
       CAST(COUNT(*) AS BIGINT) AS n
FROM obs GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# F4 — date-range table (sequence + explode)
# --------------------------------------------------------------------------

def q_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import get_date_range

    obs = observations(spark, sf_dir)
    span = obs.agg(F.min("date").alias("d0"), F.max("date").alias("d1"))
    return span.select(F.explode(get_date_range(F.col("d0"), F.col("d1"))).alias("day_str"))


O_DATE_RANGE = OBS_CTE + """
, span AS (SELECT MIN("date") AS d0, MAX("date") AS d1 FROM obs)
SELECT strftime(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)), '%Y-%m-%d') AS day_str
FROM span
"""


# --------------------------------------------------------------------------
# P7/P8/A9 — two-pass IQR clean + median fill (row-level output)
# --------------------------------------------------------------------------

def q_clean_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = observations(spark, sf_dir)
    cleaned = silver.clean_outliers(obs, ["temperature"])
    return cleaned.select("event_id", F.round("temperature", 6).alias("temperature_clean"))


O_CLEAN_OUTLIERS = OBS_CTE + """
, b AS (
  SELECT quantile_cont(temperature, 0.05) AS q1, quantile_cont(temperature, 0.95) AS q3 FROM obs
), masked AS (
  SELECT obs.event_id,
         CASE WHEN temperature < q1 - 1.5 * (q3 - q1) OR temperature > q3 + 1.5 * (q3 - q1)
              THEN NULL ELSE temperature END AS t
  FROM obs, b
), med AS (SELECT quantile_cont(t, 0.5) AS mt FROM masked)
SELECT event_id, ROUND(COALESCE(t, mt), 6) AS temperature_clean FROM masked, med
"""


# --------------------------------------------------------------------------
# JSON extraction + bucketed aggregate (get_json_object path)
# --------------------------------------------------------------------------

def q_humidity_decile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = observations(spark, sf_dir)
    return (
        obs.filter(F.col("humidity").isNotNull())
        .withColumn("decile", F.floor(F.col("humidity") / 10.0))
        .groupBy("decile")
        .agg(
            fmean1_round("temperature", 2, 6).alias("temp_mean"),
            F.count(F.lit(1)).alias("n"),
        )
    )


O_HUMIDITY_DECILE = OBS_CTE + f"""
SELECT CAST(floor(humidity / 10.0) AS BIGINT) AS decile,
       {sql_fmean1_round('temperature', 2, 6)} AS temp_mean,
       CAST(COUNT(*) AS BIGINT) AS n
FROM obs WHERE humidity IS NOT NULL GROUP BY 1
"""


# --------------------------------------------------------------------------
# A9 (per-group form) — per-city quartiles (box-plot input,
# reference src/analyze.py:474)
# --------------------------------------------------------------------------

def q_city_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = observations(spark, sf_dir)
    return obs.groupBy("city").agg(
        F.round(F.expr("percentile(wind_speed, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(wind_speed, 0.5)"), 6).alias("q2"),
        F.round(F.expr("percentile(wind_speed, 0.75)"), 6).alias("q3"),
        F.round(F.min("wind_speed"), 6).alias("lo"),
        F.round(F.max("wind_speed"), 6).alias("hi"),
    )


O_CITY_QUANTILES = OBS_CTE + """
SELECT city,
       ROUND(quantile_cont(wind_speed, 0.25), 6) AS q1,
       ROUND(quantile_cont(wind_speed, 0.50), 6) AS q2,
       ROUND(quantile_cont(wind_speed, 0.75), 6) AS q3,
       ROUND(MIN(wind_speed), 6) AS lo,
       ROUND(MAX(wind_speed), 6) AS hi
FROM obs GROUP BY city
"""


# --------------------------------------------------------------------------
# Pairwise Pearson correlations — one scan, all pairs in a single agg.
# --------------------------------------------------------------------------

def q_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation matrix entries for the numeric metrics in ONE pass
    (three F.corr aggregates share the scan and the partial-agg shuffle).
    wind_speed is derived as temperature/10, so its correlation with
    temperature pins to 1.0 — a built-in sanity anchor for the estimator;
    humidity comes from an independent field."""
    obs = observations(spark, sf_dir)
    return obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("temperature", "humidity"), 6).alias("corr_temp_humidity"),
        F.round(F.corr("temperature", "wind_speed"), 6).alias("corr_temp_wind"),
        F.round(F.corr("humidity", "wind_speed"), 6).alias("corr_humidity_wind"),
    )


O_CORRELATIONS = OBS_CTE + """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(corr(temperature, humidity), 6) AS corr_temp_humidity,
       ROUND(corr(temperature, wind_speed), 6) AS corr_temp_wind,
       ROUND(corr(humidity, wind_speed), 6) AS corr_humidity_wind
FROM obs
"""


# --------------------------------------------------------------------------
# Fixed-width histogram binning (portable width_bucket).
# --------------------------------------------------------------------------

def q_temperature_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 fixed bins of width 50 over [0, 500): the explicit floor
    arithmetic is the portable width_bucket; counts are one
    map-side-combinable agg on the derived bucket key."""
    obs = observations(spark, sf_dir)
    bucket = F.least(F.lit(9), F.greatest(F.lit(0), F.floor(F.col("temperature") / 50))).cast("int")
    return (
        obs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 50.0).alias("lo"),
            ((F.col("bucket") + 1) * 50.0).alias("hi"),
            "n",
        )
    )


O_TEMPERATURE_BUCKETS = OBS_CTE + """
, b AS (
  SELECT CAST(LEAST(9, GREATEST(0, FLOOR(temperature / 50))) AS INTEGER) AS bucket
  FROM obs
)
SELECT bucket,
       CAST(bucket * 50.0 AS DOUBLE) AS lo,
       CAST((bucket + 1) * 50.0 AS DOUBLE) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY bucket
"""


# --------------------------------------------------------------------------
# Per-city z-score anomalies (operators/gold.zscore_anomalies): the
# statistical outlier view complementing A11's fixed physical bounds.
# --------------------------------------------------------------------------

def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.zscore_anomalies(observations(spark, sf_dir),
                                 scales=_OBS_SCALES)


O_ZSCORE_ANOMALIES = OBS_CTE + f"""
, moments AS (
  -- exact fixed-point moments mirror gold.zscore_anomalies' fsum fast
  -- path (r13, was DECIMAL(28,10)): stddev from (sum, sum-of-squares)
  -- so both engines fold identically
  SELECT city,
         {sql_fsum('temperature', 2)} AS sx,
         {sql_fsum('temperature * temperature', 4)} AS sxx,
         COUNT(temperature) AS n
  FROM obs GROUP BY city
), stats AS (
  SELECT city,
         ROUND(sx / n, 6) AS city_mean,
         ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS city_std
  FROM moments
), z AS (
  SELECT o.city, o.event_id, o."timestamp",
         ROUND(o.temperature, 6) AS temperature,
         s.city_mean, s.city_std,
         ROUND((o.temperature - s.city_mean) / s.city_std, 6) AS zscore
  FROM obs o JOIN stats s USING (city)
)
SELECT * FROM z WHERE ABS(zscore) >= 2.5
"""


# --------------------------------------------------------------------------
# Seasonal (day-of-week) profile anomalies: daily mean vs the city's
# same-weekday climatology.
# --------------------------------------------------------------------------

_SEASONAL_DEV = 2.0


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose mean temperature deviates from the city's same-weekday
    mean by more than ±2° — the seasonal-decomposition cousin of the
    z-score anomaly query (profile join instead of global moments).

    Weekday index is ``epoch_days % 7`` — zone-free integer arithmetic
    both engines compute identically (named day-of-week functions differ
    in week-start conventions across engines). Two aggregates over one
    obs scan lineage, joined on the (city, weekday) profile — the join is
    per-day rows against a 7-row-per-city profile, never raw
    observations."""
    obs = observations(spark, sf_dir)
    dow = (F.unix_date(F.col("date")) % 7).cast("int")
    daily = obs.groupBy("city", "date").agg(
        fmean1_round("temperature", 2, 6).alias("daily_mean"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    prof = (
        obs.withColumn("dow_idx", dow)
        .groupBy("city", "dow_idx")
        .agg(fmean1_round("temperature", 2, 6).alias("dow_mean"))
    )
    dev = F.round(F.col("daily_mean") - F.col("dow_mean"), 6)
    return (
        daily.withColumn("dow_idx", dow)
        .join(prof, ["city", "dow_idx"])
        .select("city", "date", "dow_idx", "daily_mean", "dow_mean", "n_obs",
                dev.alias("deviation"))
        .filter(F.abs(F.col("deviation")) > _SEASONAL_DEV)
    )


O_SEASONAL_ANOMALY = OBS_CTE + f"""
, daily AS (
  SELECT city, "date",
         {sql_fmean1_round('temperature', 2, 6)} AS daily_mean,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM obs GROUP BY 1, 2
), prof AS (
  SELECT city, CAST(("date" - DATE '1970-01-01') % 7 AS INTEGER) AS dow_idx,
         {sql_fmean1_round('temperature', 2, 6)} AS dow_mean
  FROM obs GROUP BY 1, 2
)
SELECT d.city, d."date",
       CAST((d."date" - DATE '1970-01-01') % 7 AS INTEGER) AS dow_idx,
       d.daily_mean, p.dow_mean, d.n_obs,
       ROUND(d.daily_mean - p.dow_mean, 6) AS deviation
FROM daily d
JOIN prof p ON d.city = p.city
           AND CAST((d."date" - DATE '1970-01-01') % 7 AS INTEGER) = p.dow_idx
WHERE ABS(ROUND(d.daily_mean - p.dow_mean, 6)) > {_SEASONAL_DEV}
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-city temperature stats: clamp to the city's own
    [p05, p95] band, then aggregate — the robust-mean companion to the
    MAD outlier detector (clamping instead of dropping keeps n stable).
    Per-group percentiles are one aggregation pass; the tiny bounds table
    broadcasts back; the clamp is a pure row expression. Clamped values
    mix 2-dp raw temps with 6-dp bounds, so the mean uses the generic
    scale-6 exact fold."""
    from ..functions.exact import fmean

    obs = observations(spark, sf_dir)
    bounds = obs.groupBy("city").agg(
        F.round(F.expr("percentile(temperature, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(temperature, 0.95)"), 6).alias("hi"),
    )
    clamped = obs.join(F.broadcast(bounds), "city").select(
        "city",
        "lo",
        "hi",
        F.least(F.greatest(F.col("temperature"), F.col("lo")), F.col("hi")).alias("t"),
    )
    return clamped.groupBy("city").agg(
        fmean_round("t", 6).alias("wins_mean"),
        F.min("lo").alias("p05"),
        F.min("hi").alias("p95"),
        F.count(F.lit(1)).alias("n_obs"),
    )


O_WINSORIZED_STATS = OBS_CTE + f"""
, bounds AS (
  SELECT city,
         ROUND(quantile_cont(temperature, 0.05), 6) AS lo,
         ROUND(quantile_cont(temperature, 0.95), 6) AS hi
  FROM obs GROUP BY city
),
clamped AS (
  SELECT o.city, lo, hi,
         LEAST(GREATEST(temperature, lo), hi) AS t
  FROM obs o JOIN bounds USING (city)
)
SELECT city,
       {sql_fmean_round('t', 6)} AS wins_mean,
       MIN(lo) AS p05,
       MIN(hi) AS p95,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM clamped GROUP BY city
"""


QUERIES = {
    "weather_winsorized_stats": q_winsorized_stats,
    "weather_seasonal_anomaly": q_seasonal_anomaly,
    "weather_correlations": q_correlations,
    "weather_zscore_anomalies": q_zscore_anomalies,
    "weather_temperature_buckets": q_temperature_buckets,
    "weather_basic_stats": q_basic_stats,
    "weather_city_quantiles": q_city_quantiles,
    "weather_city_comparison": q_city_comparison,
    "weather_warmest_coldest": q_warmest_coldest,
    "weather_daily_city_agg": q_daily_city_agg,
    "weather_condition_histogram": q_condition_histogram,
    "weather_condition_mode_by_city": q_condition_mode_by_city,
    "weather_daily_pivot": q_daily_pivot,
    "weather_quantile_summary": q_quantile_summary,
    "weather_linear_fit": q_linear_fit,
    "weather_outlier_counts": q_outlier_counts,
    "weather_exact_median": q_exact_median,
    "weather_temperature_trends": q_temperature_trends,
    "weather_derived_projection": q_derived_projection,
    "weather_icon_lookup": q_icon_lookup,
    "weather_date_range": q_date_range,
    "weather_clean_outliers": q_clean_outliers,
    "weather_humidity_decile_agg": q_humidity_decile_agg,
}

ORACLES = {
    "weather_winsorized_stats": O_WINSORIZED_STATS,
    "weather_seasonal_anomaly": O_SEASONAL_ANOMALY,
    "weather_correlations": O_CORRELATIONS,
    "weather_zscore_anomalies": O_ZSCORE_ANOMALIES,
    "weather_temperature_buckets": O_TEMPERATURE_BUCKETS,
    "weather_basic_stats": O_BASIC_STATS,
    "weather_city_quantiles": O_CITY_QUANTILES,
    "weather_city_comparison": O_CITY_COMPARISON,
    "weather_warmest_coldest": O_WARMEST_COLDEST,
    "weather_daily_city_agg": O_DAILY_CITY_AGG,
    "weather_condition_histogram": O_CONDITION_HISTOGRAM,
    "weather_condition_mode_by_city": O_CONDITION_MODE,
    "weather_daily_pivot": O_DAILY_PIVOT,
    "weather_quantile_summary": O_QUANTILE_SUMMARY,
    "weather_linear_fit": O_LINEAR_FIT,
    "weather_outlier_counts": O_OUTLIER_COUNTS,
    "weather_exact_median": O_EXACT_MEDIAN,
    "weather_temperature_trends": O_TEMPERATURE_TRENDS,
    "weather_derived_projection": O_DERIVED_PROJECTION,
    "weather_icon_lookup": O_ICON_LOOKUP,
    "weather_date_range": O_DATE_RANGE,
    "weather_clean_outliers": O_CLEAN_OUTLIERS,
    "weather_humidity_decile_agg": O_HUMIDITY_DECILE,
}
