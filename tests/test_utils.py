"""Utility-layer tests: timestamps, logging, profiling, lenient failures."""

from pathlib import Path

import numpy as np
import pytest

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.utils.logging import (
    CommandTimer,
    banner,
    configure_logging,
    print_summary,
)
from radar_point_cloud_tracking_tpu.utils.profiling import StageTimer
from tests.conftest import make_radar_csv


def test_parse_timestamp():
    dt, ms = rpt.parse_timestamp("20250813_142602_181.csv")
    assert dt.year == 2025 and dt.second == 2
    assert ms % 1000 == 181
    with pytest.raises(ValueError):
        rpt.parse_timestamp("not_a_timestamp.csv")


def test_group_files_window(tmp_path):
    g40 = tmp_path / "gain_40"
    g50 = tmp_path / "gain_50"
    g40.mkdir()
    g50.mkdir()
    # two frames: files 1.5 s apart group, 3 s apart split
    make_radar_csv(g40 / "20250813_142600_000.csv", 2, 8, gain=40)
    make_radar_csv(g50 / "20250813_142601_500.csv", 2, 8, gain=50)
    make_radar_csv(g40 / "20250813_142604_000.csv", 2, 8, gain=40)
    files = rpt.discover_files(tmp_path)
    frames = rpt.group_files_by_frame(files)
    assert len(frames) == 2
    assert set(frames[0]) == {40, 50}
    assert set(frames[1]) == {40}


def test_lenient_bad_file_handling(tmp_path, capsys):
    """A corrupt CSV in the middle of a sequence is skipped, not fatal
    (reference behaviour, 4_temporal_object_tracker.py:192-195)."""
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader

    g = tmp_path / "gain_75"
    g.mkdir()
    make_radar_csv(g / "20250813_142600_000.csv", 8, 16, gain=75)
    (g / "20250813_142603_000.csv").write_text("Status,Scale\ngarbage")
    make_radar_csv(g / "20250813_142606_000.csv", 8, 16, gain=75)

    loader = FrameBatchLoader(intensity_threshold=10.0, point_stride=1,
                              verbose=False, frame_capacity=2048)
    loader.config.radar.num_echo_columns = 16
    files = rpt.discover_files(tmp_path)
    frames = rpt.group_files_by_frame(files)
    ingested = loader.load_sequence(frames)
    # the garbage frame parses to a nearly-empty sweep or is skipped; the
    # two good frames must survive with the right ids
    assert ingested.num_frames >= 2
    assert 0 in ingested.frame_ids and 2 in ingested.frame_ids


def test_stage_timer():
    timer = StageTimer(verbose=False)
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    report = timer.report()
    assert set(report) == {"a", "b"}
    assert timer.total >= 0


def test_logging_helpers(capsys):
    logger = configure_logging(1)
    assert logger.name == "radar_tpu"
    assert banner("Stage", (2, 6)) == "[2/6] Stage"
    print_summary("Done", {"Points": "1,234", "Clusters": "5"})
    out = capsys.readouterr().out
    assert "Points: 1,234" in out and "┌" in out
    t = CommandTimer()
    key, val = t.row()
    assert key == "Duration" and val.endswith("s")


def test_committed_baseline_ratio_staleness_guard(tmp_path, monkeypatch):
    """bench._committed_baseline_ratio: a pinned record whose oracle-labels
    sha no longer matches the live oracle labels must be rejected (return
    None) instead of silently keeping the obsolete denominator; a matching
    sha (or no labels passed) yields the pinned ratio."""
    import hashlib
    import json
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    labels = np.array([0, 0, 1, -1, 2], np.int64)
    sha = hashlib.sha256(
        np.ascontiguousarray(labels.astype(np.int32))).hexdigest()
    data_dir = tmp_path / "sig_x"
    data_dir.mkdir()
    rec = {"pipeline": "tracker", "frames": 4, "median_seconds": 80.0,
           "labels_sha256": sha, "env": {"times_s": [80.0, 81.0, 79.0]}}
    (data_dir / "cpu_baseline_f4.json").write_text(json.dumps(rec))

    # matching sha -> pinned ratio (tpu_fps / (frames / median))
    got = bench._committed_baseline_ratio(data_dir, "cpu_baseline_f4.json",
                                          4, 10.0, cpu_labels=labels)
    assert got == 200.0
    # no labels passed -> ratio still computed (guard is opt-in per caller)
    assert bench._committed_baseline_ratio(
        data_dir, "cpu_baseline_f4.json", 4, 10.0) == 200.0
    # drifted labels -> stale record rejected
    drifted = labels.copy()
    drifted[0] = 5
    assert bench._committed_baseline_ratio(
        data_dir, "cpu_baseline_f4.json", 4, 10.0,
        cpu_labels=drifted) is None
    # frame-count mismatch -> skipped
    assert bench._committed_baseline_ratio(
        data_dir, "cpu_baseline_f4.json", 8, 10.0,
        cpu_labels=labels) is None
