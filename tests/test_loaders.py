"""Loader/writer unit tests (parity with reference tests/test_loaders.py)."""

from pathlib import Path

import numpy as np
import pytest

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.core import write_ply_arrays


def test_load_radar_csv_shapes(sample_radar_csv):
    sweep = rpt.load_radar_csv(sample_radar_csv)
    assert sweep.intensities.shape == (8, 1024)
    assert sweep.ranges.shape == (8, 1024)
    assert sweep.angles_rad.shape == (8,)
    assert sweep.gain == 75
    assert sweep.scale[0] == 496.0


def test_load_radar_csv_angle_conversion(sample_radar_csv):
    sweep = rpt.load_radar_csv(sample_radar_csv)
    expected = np.deg2rad(np.arange(8, dtype=np.float32) * 16.0 * (360.0 / 8196.0))
    np.testing.assert_allclose(sweep.angles_rad, expected, rtol=1e-6)


def test_load_radar_csv_range_grid(sample_radar_csv):
    sweep = rpt.load_radar_csv(sample_radar_csv)
    np.testing.assert_allclose(
        sweep.ranges[0], (496.0 / 1024) * np.arange(1024), rtol=1e-6)


def test_load_cartesian_csv(sample_cartesian_csv):
    cloud = rpt.load_cartesian_csv(sample_cartesian_csv)
    assert cloud.size == 3
    np.testing.assert_allclose(cloud.x, [1.0, 3.0, 5.0])
    np.testing.assert_allclose(cloud.z, [128, 64, 32])


def test_load_ply_with_colors(sample_ply):
    cloud = rpt.load_ply(sample_ply)
    assert cloud.size == 3
    np.testing.assert_allclose(cloud.x, [1.0, 4.0, 7.0])
    assert cloud.colors is not None
    np.testing.assert_array_equal(cloud.colors[0], [255, 0, 0])


def test_load_ply_invalid(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_text("not a ply file\n")
    with pytest.raises(ValueError):
        rpt.load_ply(bad)


def test_detect_csv_format(sample_radar_csv, sample_cartesian_csv):
    assert rpt.detect_csv_format(sample_radar_csv) == "radar"
    assert rpt.detect_csv_format(sample_cartesian_csv) == "cartesian"


def test_ply_roundtrip_ascii_and_binary(tmp_path: Path):
    rng = np.random.default_rng(1)
    n = 500
    x = (rng.random(n) * 100).astype(np.float32)
    y = (rng.random(n) * 100 - 50).astype(np.float32)
    z = (rng.random(n) * 255).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)

    write_ply_arrays(tmp_path / "a.ply", x, y, z, rgb)
    write_ply_arrays(tmp_path / "b.ply", x, y, z, rgb, use_binary=True)

    ca = rpt.load_ply(tmp_path / "a.ply")
    np.testing.assert_allclose(ca.x, x, atol=1e-5)
    np.testing.assert_allclose(ca.z, z, atol=1e-5)
    np.testing.assert_array_equal(ca.colors, rgb)

    cb = rpt.load_ply(tmp_path / "b.ply")
    np.testing.assert_array_equal(cb.x, x)
    np.testing.assert_array_equal(cb.colors, rgb)


def test_ply_default_gray_when_no_colors(tmp_path: Path):
    content = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n1 2 3\n4 5 6\n"
    )
    p = tmp_path / "nocolor.ply"
    p.write_text(content)
    cloud = rpt.load_ply(p)
    np.testing.assert_array_equal(cloud.colors, np.full((2, 3), 180))


def test_labels_csv(tmp_path: Path):
    from radar_point_cloud_tracking_tpu.core import write_labels_csv

    coords = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    labels = np.array([0, -1])
    write_labels_csv(tmp_path / "labels.csv", coords, labels)
    lines = (tmp_path / "labels.csv").read_text().splitlines()
    assert lines[0] == "x,y,z,label"
    assert lines[1] == "1.000000,2.000000,3.000000,0"
    assert lines[2] == "4.000000,5.000000,6.000000,-1"


def test_native_matches_numpy_fallback(sample_radar_csv, monkeypatch):
    from radar_point_cloud_tracking_tpu import native
    from radar_point_cloud_tracking_tpu.core.loaders import load_radar_table

    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    fast = load_radar_table(sample_radar_csv)
    monkeypatch.setattr(native, "HAVE_NATIVE", False)
    slow = load_radar_table(sample_radar_csv)
    np.testing.assert_array_equal(fast, slow)


def test_csv_with_missing_fields(tmp_path: Path):
    """Short rows fill with zeros (pandas fillna(0) parity)."""
    header = "Status,Scale,Range,Gain,Angle," + ",".join(
        f"Echo_{i}" for i in range(8))
    path = tmp_path / "short.csv"
    path.write_text(header + "\n1,496,3,75,0,1,2,3\n")
    from radar_point_cloud_tracking_tpu.core.loaders import load_radar_table

    table = load_radar_table(path, num_echo_columns=8)
    assert table.shape == (1, 13)
    np.testing.assert_array_equal(table[0, 5:], [1, 2, 3, 0, 0, 0, 0, 0])
