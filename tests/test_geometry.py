"""Device geometry kernels vs the CPU oracle (exact-match)."""

import numpy as np
import jax.numpy as jnp

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.ops import geometry
from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
    oracle_convert_sweep,
)


def _rand_sweep(rng, rows=32, bins=64, scale=496.0):
    echo = rng.integers(0, 256, (rows, bins)).astype(np.float32)
    angles = np.deg2rad(
        rng.integers(0, 8196, rows).astype(np.float32) * (360.0 / 8196.0))
    scale_arr = np.full(rows, scale, dtype=np.float32)
    return echo, angles, scale_arr


def test_polar_to_cartesian_cardinal_angles():
    angles = jnp.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2], dtype=jnp.float32)
    ranges = jnp.ones((4, 1), dtype=jnp.float32) * 10.0
    x, y = geometry.polar_to_cartesian(angles, ranges)
    np.testing.assert_allclose(np.asarray(x).ravel(), [10, 0, -10, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).ravel(), [0, 10, 0, -10], atol=1e-4)


def test_convert_sweep_matches_oracle_exact():
    rng = np.random.default_rng(3)
    echo, angles, scale = _rand_sweep(rng)
    for threshold, stride in [(10.0, 1), (10.0, 4), (0.0, 16), (100.0, 2)]:
        ox, oy, oz = oracle_convert_sweep(echo, angles, scale, threshold, stride)
        cap = geometry._auto_capacity(echo.size, stride)
        xyz, count = geometry.convert_sweep(
            jnp.asarray(echo), jnp.asarray(angles), jnp.asarray(scale),
            jnp.ones(echo.shape[0], bool), jnp.float32(threshold),
            stride, cap, echo.shape[1])
        n = int(count)
        assert n == len(ox), (threshold, stride)
        xyz = np.asarray(xyz)
        np.testing.assert_allclose(xyz[:n, 0], ox, rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(xyz[:n, 1], oy, rtol=1e-6, atol=1e-4)
        np.testing.assert_array_equal(xyz[:n, 2], oz)


def test_convert_sweep_row_valid_mask():
    rng = np.random.default_rng(4)
    echo, angles, scale = _rand_sweep(rng, rows=16, bins=8)
    row_valid = np.zeros(16, dtype=bool)
    row_valid[:10] = True
    ox, oy, oz = oracle_convert_sweep(
        echo[:10], angles[:10], scale[:10], 50.0, 2)
    cap = geometry._auto_capacity(echo.size, 2)
    xyz, count = geometry.convert_sweep(
        jnp.asarray(echo), jnp.asarray(angles), jnp.asarray(scale),
        jnp.asarray(row_valid), jnp.float32(50.0), 2, cap, 8)
    n = int(count)
    assert n == len(ox)
    np.testing.assert_allclose(np.asarray(xyz)[:n, 2], oz)


def test_batched_conversion_matches_single():
    rng = np.random.default_rng(5)
    sweeps = [_rand_sweep(rng, rows=16, bins=32) for _ in range(3)]
    echo = np.stack([s[0] for s in sweeps])
    angles = np.stack([s[1] for s in sweeps])
    scale = np.stack([s[2] for s in sweeps])
    rv = np.ones((3, 16), dtype=bool)
    cap = geometry._auto_capacity(16 * 32, 2)
    xyz_b, counts = geometry.convert_sweeps_batched(
        jnp.asarray(echo), jnp.asarray(angles), jnp.asarray(scale),
        jnp.asarray(rv), jnp.float32(20.0), 2, cap, 32)
    for g in range(3):
        xyz_s, count_s = geometry.convert_sweep(
            jnp.asarray(echo[g]), jnp.asarray(angles[g]),
            jnp.asarray(scale[g]), jnp.asarray(rv[g]),
            jnp.float32(20.0), 2, cap, 32)
        assert int(counts[g]) == int(count_s)
        np.testing.assert_array_equal(np.asarray(xyz_b[g]), np.asarray(xyz_s))


def test_repack_padded_preserves_order():
    vals = np.full((3, 4, 2), geometry.PAD_COORD, dtype=np.float32)
    vals[0, :2] = [[1, 1], [2, 2]]
    vals[1, :1] = [[3, 3]]
    vals[2, :3] = [[4, 4], [5, 5], [6, 6]]
    counts = np.array([2, 1, 3], dtype=np.int32)
    out, total = geometry.repack_padded(jnp.asarray(vals), jnp.asarray(counts), 8)
    assert int(total) == 6
    np.testing.assert_array_equal(
        np.asarray(out)[:6, 0], [1, 2, 3, 4, 5, 6])
    assert np.all(np.asarray(out)[6:, 0] == geometry.PAD_COORD)


def test_sweep_to_point_cloud_host(sample_radar_csv):
    sweep = rpt.load_radar_csv(sample_radar_csv)
    from radar_point_cloud_tracking_tpu.config import ProcessingConfig

    cfg = ProcessingConfig(intensity_threshold=10.0, point_stride=4)
    cloud = geometry.sweep_to_point_cloud_host(sweep, cfg)
    ox, oy, oz = oracle_convert_sweep(
        sweep.intensities, sweep.angles_rad, sweep.scale, 10.0, 4)
    assert cloud.size == len(ox)
    np.testing.assert_allclose(cloud.x, ox, rtol=1e-6, atol=1e-4)


def test_sweep_to_points_simple_uniform_bins():
    rng = np.random.default_rng(6)
    echo = rng.integers(0, 100, (8, 16)).astype(np.float32)
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False, dtype=np.float32)
    x, y, z = geometry.sweep_to_points_simple(
        angles, echo, range_bin_width=0.5, min_intensity=20.0, stride=3)
    # oracle with uniform ranges
    ranges = np.arange(16, dtype=np.float32) * 0.5
    gx = ranges[None, :] * np.cos(angles)[:, None]
    gy = ranges[None, :] * np.sin(angles)[:, None]
    m = echo > 20.0
    ex, ey, ez = gx[m][::3], gy[m][::3], echo[m][::3]
    np.testing.assert_allclose(x, ex, atol=1e-4)
    np.testing.assert_allclose(y, ey, atol=1e-4)
    np.testing.assert_array_equal(z, ez)
