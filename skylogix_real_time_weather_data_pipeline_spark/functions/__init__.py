from .scalar import (  # noqa: F401
    celsius_to_fahrenheit,
    day_name,
    epoch_to_timestamp,
    fahrenheit_to_celsius,
    format_timestamp,
    get_date_range,
    iso_format,
    parse_iso_timestamp,
    weather_icon,
    WEATHER_ICONS,
)
