"""Config/JSON utility parity (ports of reference tests/test_utils.py:18-49)
and the cities broadcast dimension."""

from __future__ import annotations

from skylogix_real_time_weather_data_pipeline_spark.config import (
    DEFAULT_CONFIG,
    cities_dim,
    load_config,
    load_json,
    save_config,
    save_json,
)


def test_load_config_roundtrip(tmp_path):
    # reference tests/test_utils.py:18-33 — api.url/key survive a round-trip
    p = str(tmp_path / "config.yaml")
    save_config(DEFAULT_CONFIG, p)
    cfg = load_config(p)
    assert cfg["api"]["url"] == DEFAULT_CONFIG["api"]["url"]
    assert "key" in cfg["api"]
    assert len(cfg["data"]["cities"]) == 5


def test_save_json_roundtrip(tmp_path):
    # reference tests/test_utils.py:35-49 — content equality after write
    p = str(tmp_path / "out.json")
    data = {"city": "London", "temperature": 9.5, "tags": ["a", "b"]}
    save_json(data, p)
    assert load_json(p) == data


def test_cities_dim_broadcast_join(spark):
    import pyspark.sql.functions as F

    from skylogix_real_time_weather_data_pipeline_spark.operators.joins import (
        broadcast_dim_join,
    )

    dim = cities_dim(spark)
    obs = spark.createDataFrame(
        [("London", "GB", 9.5), ("Atlantis", "XX", 1.0)],
        "city string, country string, temperature double",
    )
    joined = broadcast_dim_join(obs, dim, on=["city", "country"])
    assert [r.city for r in joined.collect()] == ["London"]  # inner join drops unknown
