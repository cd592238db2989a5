"""Deterministic weather-domain fixtures (FIXTURES.md §1).

Generates raw OpenWeatherMap-shaped documents exercising every silver
operator: missing required keys (P1), null struct members, epoch-vs-ISO
timestamp coalesce (P3), extreme outliers (P7/A9), condition ties (A7),
multi-day series (W1/A5).
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

CITIES = [
    ("New York", "US", 12.0),
    ("London", "GB", 9.0),
    ("Tokyo", "JP", 16.0),
    ("Sydney", "AU", 22.0),
    ("Berlin", "DE", 8.0),
]
CONDITIONS = ["Clear", "Clouds", "Rain", "Drizzle", "Snow", "Mist"]


def make_raw_docs(n_days: int = 12, per_day: int = 2, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    t0 = datetime(2024, 3, 1, tzinfo=timezone.utc)
    docs = []
    for day in range(n_days):
        for k in range(per_day):
            for city, country, base in CITIES:
                ts = t0 + timedelta(days=day, hours=6 + 8 * k, minutes=rng.randint(0, 59))
                temp = base + rng.gauss(0, 4)
                if rng.random() < 0.02:
                    temp = 9999.0  # extreme outlier → IQR clean path
                doc = {
                    "city_name": city,
                    "country_code": country,
                    "extraction_timestamp": ts.replace(tzinfo=None).isoformat(),
                    "dt": int(ts.timestamp()) if rng.random() > 0.1 else None,
                    "main": {
                        "temp": round(temp, 2),
                        "feels_like": round(temp - rng.uniform(0, 3), 2),
                        "temp_min": round(temp - rng.uniform(0, 2), 2),
                        "temp_max": round(temp + rng.uniform(0, 2), 2),
                        "pressure": round(1013 + rng.gauss(0, 8), 1),
                        "humidity": float(rng.randint(20, 95)),
                    },
                    "wind": {
                        "speed": round(abs(rng.gauss(4, 2)), 2),
                        "deg": float(rng.randint(0, 359)),
                    },
                    "weather": [
                        {
                            "main": rng.choice(CONDITIONS),
                            "description": "synthetic observation",
                        }
                    ],
                }
                if rng.random() < 0.03:
                    doc.pop("wind")  # P1 skip path
                if rng.random() < 0.02:
                    doc["main"]["humidity"] = None  # null member
                docs.append(doc)
    return docs


def write_raw_json_dir(path: str, docs: list[dict]) -> None:
    """One file per document, like the reference's raw sink (K1)."""
    import os

    os.makedirs(path, exist_ok=True)
    for i, d in enumerate(docs):
        with open(f"{path}/doc_{i:05d}.json", "w") as f:
            json.dump(d, f)
