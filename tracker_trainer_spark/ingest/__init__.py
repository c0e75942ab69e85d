from .reader import read_track_lines, parse_track_records  # noqa: F401
from .validate import valid_record_predicate, split_valid  # noqa: F401
from .project import to_rewarded_decisions  # noqa: F401
from .merge import merge_rewarded_decisions, rewards_map_to_json, finalize_for_storage  # noqa: F401
from .sink import write_timeline  # noqa: F401
from .layout import zorder_frame, zorder_key  # noqa: F401
