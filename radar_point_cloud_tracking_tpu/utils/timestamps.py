"""Filename timestamp parsing, file discovery and temporal frame grouping.

Host-side metadata handling matching the reference semantics
(PointCloudWork/4_temporal_object_tracker.py:165-309,
PointCloudWorkF/stdbscan_denoising_pipeline.py:87-216).
"""

from __future__ import annotations

import re
from collections import defaultdict
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional, Set, Tuple

__all__ = [
    "parse_timestamp",
    "discover_files",
    "group_files_by_frame",
    "find_gain_sweeps",
]

_TS_RE = re.compile(r"(\d{8})_(\d{6})_(\d{3})\.csv")
_GAIN_DIR_RE = re.compile(r"gain[_-]?(\d+)", re.IGNORECASE)

# Gains recognised by the legacy pipelines (4_temporal_object_tracker.py:55).
SUPPORTED_GAINS: Set[int] = {40, 50, 70, 75}


def parse_timestamp(filename: str) -> Tuple[datetime, int]:
    """Parse ``YYYYMMDD_HHMMSS_mmm.csv`` into (datetime, epoch milliseconds)."""
    match = _TS_RE.match(filename)
    if not match:
        raise ValueError(f"Cannot parse timestamp from {filename}")
    date_str, time_str, ms_str = match.groups()
    dt = datetime.strptime(f"{date_str}_{time_str}", "%Y%m%d_%H%M%S")
    ms = int(ms_str)
    total_ms = int(dt.timestamp() * 1000) + ms
    return dt, total_ms


def discover_files(
    data_dir: Path,
    supported_gains: Optional[Set[int]] = None,
) -> Dict[int, List[Path]]:
    """Discover timestamped CSVs under ``gain_NN`` subdirectories.

    Returns {gain: [paths sorted by timestamp]}.
    """
    if supported_gains is None:
        supported_gains = SUPPORTED_GAINS
    files_by_gain: Dict[int, List[Tuple[int, Path]]] = defaultdict(list)

    for gain_dir in Path(data_dir).iterdir():
        if not gain_dir.is_dir():
            continue
        match = _GAIN_DIR_RE.search(gain_dir.name)
        if not match:
            continue
        gain = int(match.group(1))
        if gain not in supported_gains:
            continue
        for csv_path in gain_dir.glob("*.csv"):
            try:
                _, ts_ms = parse_timestamp(csv_path.name)
            except ValueError:
                continue
            files_by_gain[gain].append((ts_ms, csv_path))

    result: Dict[int, List[Path]] = {}
    for gain, files in files_by_gain.items():
        files.sort(key=lambda item: item[0])
        result[gain] = [path for _, path in files]
    return result


def group_files_by_frame(
    files_by_gain: Dict[int, List[Path]],
    max_time_diff_ms: int = 2000,
) -> List[Dict[int, Path]]:
    """Greedy grouping of files across gains into temporal frames.

    Files whose timestamps fall within ``max_time_diff_ms`` of the frame start
    belong to the same frame; the first file per gain wins.
    """
    all_files: List[Tuple[int, int, Path]] = []
    for gain, paths in files_by_gain.items():
        for path in paths:
            _, ts_ms = parse_timestamp(path.name)
            all_files.append((ts_ms, gain, path))
    all_files.sort(key=lambda item: item[0])

    frames: List[Dict[int, Path]] = []
    current_frame: Dict[int, Path] = {}
    frame_start_ts: Optional[int] = None

    for ts_ms, gain, path in all_files:
        if frame_start_ts is None:
            frame_start_ts = ts_ms
            current_frame = {gain: path}
        elif ts_ms - frame_start_ts <= max_time_diff_ms:
            if gain not in current_frame:
                current_frame[gain] = path
        else:
            if current_frame:
                frames.append(current_frame)
            frame_start_ts = ts_ms
            current_frame = {gain: path}

    if current_frame:
        frames.append(current_frame)
    return frames


def find_gain_sweeps(directory: Path) -> Dict[int, Path]:
    """Discover one gain-tagged sweep CSV per gain in a flat directory
    (reference processors/point_cloud.py:21-45)."""
    sweeps: Dict[int, Path] = {}
    for path in sorted(Path(directory).glob("*.csv")):
        match = _GAIN_DIR_RE.search(path.stem)
        if not match:
            continue
        sweeps[int(match.group(1))] = path
    if not sweeps:
        raise FileNotFoundError(f"No gain CSVs found in {directory}")
    return sweeps
