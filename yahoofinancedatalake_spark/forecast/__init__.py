from yahoofinancedatalake_spark.forecast.grouped import (  # noqa: F401
    FORECAST_SCHEMA,
    forecast_by_group,
    forecast_predictions,
    make_group_forecaster,
)
