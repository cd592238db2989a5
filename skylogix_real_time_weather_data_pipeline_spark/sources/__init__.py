from .batch import load_table, read_csv_observations, read_raw_json  # noqa: F401
from .streaming import stream_raw_json, stream_rate_observations  # noqa: F401
from .weather_api import WeatherApiDataSource  # noqa: F401
