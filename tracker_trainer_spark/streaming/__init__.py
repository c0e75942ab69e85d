from .ingest_stream import (  # noqa: F401
    read_track_stream,
    start_timeline_stream,
    merge_micro_batch,
)
