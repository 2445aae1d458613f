from mta_rtf_dbt_spark.streaming.head import (  # noqa: F401
    first_observation,
    run_to_memory,
    session_windows,
    stream_source,
    windowed_actor_counts,
)
