"""File-stage processors: sorting, filtering, batch conversion, stacking."""

from pathlib import Path

import numpy as np
import pytest

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.processors import (
    convert_batch_aligned,
    convert_single_csv,
    find_files_by_range,
    get_csv_range,
    move_files_to_gain_folders,
    remove_files_by_range,
    sniff_gain,
    sort_files_by_gain,
)
from tests.conftest import make_radar_csv


def _make_flat_dataset(tmp_path: Path, num_echo=16):
    d = tmp_path / "flat"
    d.mkdir()
    for i, gain in enumerate([40, 50, 75, 75]):
        make_radar_csv(d / f"20250813_1426{10 + i:02d}_000.csv", num_rows=4,
                       num_echo=num_echo, gain=gain)
    return d


def test_sniff_gain(tmp_path):
    d = _make_flat_dataset(tmp_path)
    files = sorted(d.glob("*.csv"))
    assert sniff_gain(files[0]) == 40
    assert sniff_gain(files[3]) == 75


def test_sort_files_by_gain_no_move(tmp_path):
    d = _make_flat_dataset(tmp_path)
    grouped = sort_files_by_gain(d)
    assert len(grouped[40]) == 1
    assert len(grouped[75]) == 2
    assert len(list(d.glob("*.csv"))) == 4  # nothing moved


def test_move_files_dry_run_vs_real(tmp_path):
    d = _make_flat_dataset(tmp_path)
    moved = move_files_to_gain_folders(d, dry_run=True, verbose=False)
    assert sum(len(v) for v in moved.values()) == 4
    assert len(list(d.glob("*.csv"))) == 4
    assert not (d / "gain_40").exists()

    moved = move_files_to_gain_folders(d, verbose=False)
    assert len(list(d.glob("*.csv"))) == 0
    assert len(list((d / "gain_75").glob("*.csv"))) == 2


def test_range_filtering(tmp_path):
    d = tmp_path / "data"
    for gain in (40, 50):
        g = d / f"gain_{gain}"
        g.mkdir(parents=True)
        make_radar_csv(g / "20250813_142610_000.csv", num_rows=2,
                       num_echo=8, gain=gain, range_val=1)
        make_radar_csv(g / "20250813_142620_000.csv", num_rows=2,
                       num_echo=8, gain=gain, range_val=3)

    files = sorted(d.glob("gain_40/*.csv"))
    assert get_csv_range(files[0]) == 1
    assert get_csv_range(files[1]) == 3

    matches = find_files_by_range(d, {1, 2}, (40, 50))
    assert len(matches) == 2

    removed = remove_files_by_range(d, {1, 2}, (40, 50), dry_run=True,
                                    verbose=False)
    assert len(removed) == 2
    assert len(list(d.glob("gain_*/*.csv"))) == 4

    remove_files_by_range(d, {1, 2}, (40, 50), verbose=False)
    assert len(list(d.glob("gain_*/*.csv"))) == 2


def test_convert_single_csv(tmp_path, small_radar_csv):
    from radar_point_cloud_tracking_tpu.config import RadarConfig

    out = tmp_path / "out.csv"
    cfg = RadarConfig(num_echo_columns=8)
    n = convert_single_csv(small_radar_csv, out, threshold=30.0, config=cfg)
    cloud = rpt.load_cartesian_csv(out)
    assert cloud.size == n
    assert np.all(cloud.z > 30.0)


def test_convert_batch_aligned(tmp_path):
    from radar_point_cloud_tracking_tpu.config import RadarConfig

    base = tmp_path / "aligned"
    for gain in (40, 50, 75):
        g = base / f"gain_{gain}"
        g.mkdir(parents=True)
        for k in range(2):
            make_radar_csv(g / f"20250813_1426{10 + k:02d}_000.csv",
                           num_rows=4, num_echo=16, gain=gain)
    out = tmp_path / "converted"
    cfg = RadarConfig(num_echo_columns=16)
    written = convert_batch_aligned(base, out, (40, 50, 75), threshold=50.0,
                                    config=cfg, verbose=False)
    assert written == 6
    assert (out / "gain_40" / "0001_gain_40_cartesian.csv").exists()
    assert (out / "gain_75" / "0002_gain_75_cartesian.csv").exists()


def test_build_stacked_clouds(tmp_path):
    from radar_point_cloud_tracking_tpu.config import (
        GainConfig, ProcessingConfig, RadarConfig)
    from radar_point_cloud_tracking_tpu.models.stack_builder import (
        build_stacked_clouds)

    d = tmp_path / "sweeps"
    d.mkdir()
    for gain in (40, 50, 75):
        make_radar_csv(d / f"sweep_gain_{gain}.csv", num_rows=8, num_echo=16,
                       gain=gain)
    out = tmp_path / "stacks"
    outputs = build_stacked_clouds(
        d, out,
        config=ProcessingConfig(intensity_threshold=0.0, point_stride=2),
        gain_config=GainConfig(),
        radar_config=RadarConfig(num_echo_columns=16),
        verbose=False)
    assert set(outputs) == {"offset", "flat"}
    flat = rpt.load_ply(outputs["flat"])
    offset = rpt.load_ply(outputs["offset"])
    assert flat.size == offset.size > 0
    # offset stack lifts gain-40 points by 500
    assert offset.z.max() >= flat.z.max() + 250


def test_cluster_ply_driver(tmp_path, gain_dataset):
    from radar_point_cloud_tracking_tpu.config import ClusteringConfig
    from radar_point_cloud_tracking_tpu.core.writers import write_ply_arrays
    from radar_point_cloud_tracking_tpu.models.cluster_ply import (
        process_ply_clustering)

    rng = np.random.default_rng(0)
    n = 60
    x = np.concatenate([rng.normal(0, 1, n // 2), rng.normal(50, 1, n // 2)])
    y = rng.normal(0, 1, n)
    z = rng.uniform(50, 100, n)
    colors = np.tile(np.array([0, 114, 255], np.uint8), (n, 1))
    ply = tmp_path / "cloud.ply"
    write_ply_arrays(ply, x.astype(np.float32), y.astype(np.float32),
                     z.astype(np.float32), colors)

    csv_path, labels = process_ply_clustering(
        ply, tmp_path, ClusteringConfig(eps_space=30.0, eps_time=1.0,
                                        min_samples=5), verbose=False)
    assert csv_path.exists()
    assert len(labels) == n
    lines = csv_path.read_text().splitlines()
    assert lines[0] == "x,y,z,label"
    assert len(lines) == n + 1
