"""Pipeline configuration (reference src/utils.py load_config/save_json,
config/config.yaml shape).

The reference drives extraction from a YAML city list (config/config.yaml:8-18)
and persists dict results as JSON (src/utils.py save_json; tested at
reference tests/test_utils.py:18-49). Same surface here, plus a helper that
turns the city list into the broadcast dimension DataFrame used for
enrichment joins (SURVEY S6/J1).
"""

from __future__ import annotations

import json
from typing import Any

DEFAULT_CONFIG: dict[str, Any] = {
    "api": {"url": "https://api.openweathermap.org/data/2.5/weather", "key": ""},
    "data": {
        "cities": [
            {"name": "New York", "country": "US"},
            {"name": "London", "country": "GB"},
            {"name": "Tokyo", "country": "JP"},
            {"name": "Sydney", "country": "AU"},
            {"name": "Berlin", "country": "DE"},
        ],
        "raw_path": "data/raw",
        "processed_path": "data/processed",
        "output_path": "data/output",
    },
    "pipeline": {"batch_size": 10, "timeout": 30, "retry_attempts": 3},
}


def load_config(path: str) -> dict[str, Any]:
    """YAML config round-trip (reference src/utils.py; test parity with
    reference tests/test_utils.py:18-33)."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def save_config(cfg: dict[str, Any], path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def save_json(data: Any, path: str, indent: int = 2) -> None:
    """Dict → JSON file (reference src/utils.py save_json; test parity with
    reference tests/test_utils.py:35-49)."""
    with open(path, "w") as f:
        json.dump(data, f, indent=indent, default=str)


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def cities_dim(spark, cfg: dict[str, Any] | None = None):
    """The config city list as a broadcast-ready dimension DataFrame
    (SURVEY S6: config-driven source enumeration; J1: enrichment join)."""
    cfg = cfg or DEFAULT_CONFIG
    rows = [(c["name"], c["country"]) for c in cfg["data"]["cities"]]
    return spark.createDataFrame(rows, "city string, country string")
