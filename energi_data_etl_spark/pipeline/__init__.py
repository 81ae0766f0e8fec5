from .energy import daily_average, zone_summary, HOURLY_PRICE_SCHEMA, DAILY_AVG_SCHEMA  # noqa: F401
