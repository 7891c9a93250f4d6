from yahoofinancedatalake_spark.streaming.ops import (  # noqa: F401
    RUNNING_LAST_SCHEMA,
    running_last_state,
    stream_daily_avg,
    stream_dedup_by_id,
    stream_enrich,
    stream_last_value_per_group,
    stream_sessions,
    stream_sliding_distinct,
    stream_stream_attribution,
)
from yahoofinancedatalake_spark.streaming.sinks import (  # noqa: F401
    foreach_batch_upsert,
)
