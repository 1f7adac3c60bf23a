from .ops import (  # noqa: F401
    stream_dedup,
    stream_incremental_upsert,
    stream_session_agg,
    stream_windowed_agg,
)
