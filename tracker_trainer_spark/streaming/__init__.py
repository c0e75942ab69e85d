from .ingest_stream import (  # noqa: F401
    read_track_stream,
    start_timeline_stream,
    merge_micro_batch,
)
from .stateful_merge import (  # noqa: F401
    MERGED_SCHEMA,
    stateful_merge_stream,
)
from .stream_join import decisions_rewards_join  # noqa: F401
from .score_stream import score_stream, start_ranking_stream  # noqa: F401
