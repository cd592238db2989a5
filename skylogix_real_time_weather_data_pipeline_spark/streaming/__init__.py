from .listener import MetricsListener, attach_metrics_listener  # noqa: F401
from .pipeline import (  # noqa: F401
    clean_outliers_with_bounds,
    daily_city_window,
    run_bronze_to_silver_available_now,
    sessionize,
    silver_stream,
)
