from .checks import (  # noqa: F401
    physical_plan,
    count_shuffles,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
    scan_columns,
    single_task_windows,
)
