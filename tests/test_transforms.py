"""Reference-named transform API (parity with reference
tests/test_transforms.py)."""

import numpy as np

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.config import ProcessingConfig
from radar_point_cloud_tracking_tpu.core.containers import PointCloud
from radar_point_cloud_tracking_tpu.core.transforms import (
    apply_stride,
    apply_z_offset,
    gain_to_colors,
    intensity_to_colors,
    polar_to_cartesian,
    subsample_cloud,
    sweep_to_point_cloud,
    sweep_to_points_simple,
)


def test_polar_to_cartesian_cardinals():
    angles = np.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2], np.float32)
    ranges = np.full((4, 1), 5.0, np.float32)
    x, y = polar_to_cartesian(angles, ranges)
    np.testing.assert_allclose(x.ravel(), [5, 0, -5, 0], atol=1e-4)
    np.testing.assert_allclose(y.ravel(), [0, 5, 0, -5], atol=1e-4)


def test_polar_to_cartesian_multibin_broadcast():
    angles = np.zeros(3, np.float32)
    ranges = np.tile(np.arange(4, dtype=np.float32), (3, 1))
    x, y = polar_to_cartesian(angles, ranges)
    assert x.shape == (3, 4)
    np.testing.assert_allclose(x[0], [0, 1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(y, 0, atol=1e-5)


def test_sweep_to_point_cloud_threshold_and_stride(sample_radar_csv):
    sweep = rpt.load_radar_csv(sample_radar_csv)
    cfg = ProcessingConfig(intensity_threshold=128.0, point_stride=3)
    cloud = sweep_to_point_cloud(sweep, cfg)
    expected = sweep.intensities[sweep.intensities > 128.0][::3]
    np.testing.assert_array_equal(cloud.z, expected)


def test_sweep_to_points_simple_uniform():
    echo = np.array([[0.0, 10.0, 20.0], [5.0, 15.0, 25.0]], np.float32)
    angles = np.array([0.0, np.pi], np.float32)
    x, y, z = sweep_to_points_simple(angles, echo, range_bin_width=2.0,
                                     min_intensity=9.0)
    # survivors: row0 bins 1,2 and row1 bins 1,2
    np.testing.assert_array_equal(z, [10, 20, 15, 25])
    np.testing.assert_allclose(x, [2, 4, -2, -4], atol=1e-4)


def _cloud(n=100):
    rng = np.random.default_rng(0)
    return PointCloud(x=rng.random(n).astype(np.float32),
                      y=rng.random(n).astype(np.float32),
                      z=rng.random(n).astype(np.float32),
                      colors=rng.integers(0, 256, (n, 3)).astype(np.uint8))


def test_subsample_semantics():
    cloud = _cloud(100)
    small, stride = subsample_cloud(cloud, 40)
    assert small.size == 40 and stride == 3
    same, stride = subsample_cloud(cloud, 200)
    assert same.size == 100 and stride == 1


def test_apply_stride_and_offset():
    cloud = _cloud(10)
    s = apply_stride(cloud, 2)
    assert s.size == 5
    np.testing.assert_array_equal(s.x, cloud.x[::2])
    np.testing.assert_array_equal(s.colors, cloud.colors[::2])
    o = apply_z_offset(cloud, 100.0)
    np.testing.assert_allclose(o.z, cloud.z + 100.0)


def test_grayscale_mapping():
    colors = intensity_to_colors(np.array([0.0, 128.0, 300.0]))
    np.testing.assert_array_equal(colors[0], [0, 0, 0])
    np.testing.assert_array_equal(colors[1], [128, 128, 128])
    np.testing.assert_array_equal(colors[2], [255, 255, 255])  # clipped


def test_gain_to_colors():
    out = gain_to_colors(np.zeros(4), 40, {40: (0, 114, 255)})
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[0], [0, 114, 255])
    default = gain_to_colors(np.zeros(2), 99, {40: (0, 114, 255)})
    np.testing.assert_array_equal(default[0], [180, 180, 180])
