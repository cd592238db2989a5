"""Scalar function library (SURVEY.md §2.8, F1-F10).

Engine policy: **zero Python UDFs** — every scalar the reference implements
as a Python function is expressed as a native Column expression, so it stays
inside whole-stage codegen and never crosses the JVM↔Python boundary.

Parity citations refer to /root/reference/src/utils.py and
/root/reference/src/transform.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F5: 15-entry icon lookup, default '❓' (reference src/utils.py:131-159).
# A MapType literal + element_at keeps this JVM-side; no UDF.
WEATHER_ICONS: dict[str, str] = {
    "Clear": "☀️",
    "Clouds": "☁️",
    "Rain": "🌧️",
    "Drizzle": "🌦️",
    "Thunderstorm": "⛈️",
    "Snow": "❄️",
    "Mist": "🌫️",
    "Smoke": "🌫️",
    "Haze": "🌫️",
    "Dust": "🌫️",
    "Fog": "🌫️",
    "Sand": "🌫️",
    "Ash": "🌫️",
    "Squall": "💨",
    "Tornado": "🌪️",
}

def _icon_map() -> Column:
    # built lazily: Column literals require an active SparkContext
    return F.create_map(*[F.lit(x) for kv in WEATHER_ICONS.items() for x in kv])


def celsius_to_fahrenheit(c: Column | str) -> Column:
    """F1: c*9/5+32 (reference src/utils.py:95-105)."""
    c = F.col(c) if isinstance(c, str) else c
    return c * 9.0 / 5.0 + 32.0


def fahrenheit_to_celsius(f: Column | str) -> Column:
    """F2: (f-32)*5/9 (reference src/utils.py:107-117)."""
    f = F.col(f) if isinstance(f, str) else f
    return (f - 32.0) * 5.0 / 9.0


def format_timestamp(ts: Column | str) -> Column:
    """F3: '%Y-%m-%d %H:%M:%S' formatting (reference src/utils.py:119-129)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def get_date_range(start: Column | str, end: Column | str) -> Column:
    """F4: inclusive array of 'YYYY-MM-DD' strings (reference src/utils.py:67-93).

    ``sequence`` + ``transform`` — generated JVM-side, explodable to a table.
    """
    start = F.to_date(F.lit(start)) if isinstance(start, str) else F.to_date(start)
    end = F.to_date(F.lit(end)) if isinstance(end, str) else F.to_date(end)
    seq = F.sequence(start, end, F.expr("interval 1 day"))
    return F.transform(seq, lambda d: F.date_format(d, "yyyy-MM-dd"))


def weather_icon(condition: Column | str) -> Column:
    """F5: icon lookup with '❓' default (reference src/utils.py:131-159)."""
    condition = F.col(condition) if isinstance(condition, str) else condition
    return F.coalesce(F.element_at(_icon_map(), condition), F.lit("❓"))


def epoch_to_timestamp(dt: Column | str) -> Column:
    """F6: epoch-seconds → timestamp (reference src/transform.py:105).

    The reference uses local time via ``datetime.fromtimestamp``; we pin the
    session timezone to UTC (session.py), so this is UTC by construction.
    """
    dt = F.col(dt) if isinstance(dt, str) else dt
    return F.timestamp_seconds(dt)


def parse_iso_timestamp(s: Column | str) -> Column:
    """F7: ISO-8601 parse (reference src/transform.py:107).

    ``to_timestamp`` without a format handles both second and microsecond
    precision ISO strings, like ``datetime.fromisoformat``.
    """
    s = F.col(s) if isinstance(s, str) else s
    return F.to_timestamp(s)


def day_name(ts: Column | str) -> Column:
    """F8: English day name (reference src/transform.py:200)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(ts, "EEEE")


def iso_format(ts: Column | str) -> Column:
    """F9: .isoformat() serialization (reference src/analyze.py:162-163)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
