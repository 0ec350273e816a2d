"""Host-side utilities: timestamps, discovery, logging, profiling."""

from .timestamps import (  # noqa: F401
    discover_files,
    find_gain_sweeps,
    group_files_by_frame,
    parse_timestamp,
)
