"""Native streaming land-filter kernels vs the NumPy reference composition."""

import numpy as np
import pytest

from radar_point_cloud_tracking_tpu import native

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native library unavailable")


def _synthetic_sweep(rng, n_rows=64, n_pts=500, num_bins=128):
    rows = rng.integers(0, n_rows, n_pts).astype(np.uint16)
    bins = rng.integers(0, num_bins, n_pts).astype(np.uint16)
    vals = rng.integers(11, 255, n_pts).astype(np.float32)
    ang_units = rng.uniform(0, 8195, n_rows).astype(np.float32)
    scales = np.full(n_rows, 496.0, np.float32)
    ang = np.deg2rad(ang_units * np.float32(360.0 / 8196.0))
    tables = (scales / np.float32(num_bins), np.cos(ang), np.sin(ang))
    return rows, bins, vals, tables


def _xy(rows, bins, tables):
    scale_div, cos_r, sin_r = tables
    r = scale_div[rows] * bins.astype(np.float32)
    return r * cos_r[rows], r * sin_r[rows]


def test_native_land_kernels_match_numpy():
    rng = np.random.default_rng(0)
    sweeps = [_synthetic_sweep(rng) for _ in range(5)]

    # bounds
    bounds = np.array([np.inf, -np.inf, np.inf, -np.inf], np.float32)
    xs, ys, vs = [], [], []
    for rows, bins, vals, tables in sweeps:
        native.sweep_xy_bounds(rows, bins, *tables, bounds)
        x, y = _xy(rows, bins, tables)
        xs.append(x)
        ys.append(y)
        vs.append(vals)
    all_x, all_y = np.concatenate(xs), np.concatenate(ys)
    assert bounds[0] == all_x.min() and bounds[1] == all_x.max()
    assert bounds[2] == all_y.min() and bounds[3] == all_y.max()

    res = 5.0
    x_edges = np.arange(float(bounds[0]), float(bounds[1]) + res, res)
    y_edges = np.arange(float(bounds[2]), float(bounds[3]) + res, res)
    nx, ny = len(x_edges) - 1, len(y_edges) - 1

    # grid accumulation (native) vs np.digitize/bincount
    count = np.zeros(nx * ny, np.int64)
    isum = np.zeros(nx * ny, np.float64)
    for rows, bins, vals, tables in sweeps:
        native.land_grid_accumulate(rows, bins, vals, *tables,
                                    x_edges, y_edges, count, isum)
    xi = np.clip(np.digitize(all_x, x_edges) - 1, 0, nx - 1)
    yi = np.clip(np.digitize(all_y, y_edges) - 1, 0, ny - 1)
    cell = xi.astype(np.int64) * ny + yi
    want_count = np.bincount(cell, minlength=nx * ny)
    want_isum = np.bincount(
        cell, weights=np.concatenate(vs).astype(np.float64),
        minlength=nx * ny)
    np.testing.assert_array_equal(count, want_count)
    np.testing.assert_array_equal(isum, want_isum)  # bitwise: same add order

    # filtering (native, in place) vs boolean-mask composition
    land = (count > 3).astype(np.uint8)  # arbitrary mask for the test
    off = 0
    for rows, bins, vals, tables in sweeps:
        n = len(rows)
        keep = ~land.astype(bool)[cell[off:off + n]]
        off += n
        want_rows = rows[keep].copy()
        want_vals = vals[keep].copy()
        kept = native.land_filter_sweep(rows, bins, vals, *tables,
                                        x_edges, y_edges, land)
        assert kept == int(keep.sum())
        np.testing.assert_array_equal(rows[:kept], want_rows)
        np.testing.assert_array_equal(vals[:kept], want_vals)


def test_native_digitize_on_exact_edges():
    """Points exactly ON a bin edge must take the same cell as np.digitize."""
    num_bins = 4
    n_rows = 1
    # angle 0 -> x = r, y = 0; scale chosen so x values are exact integers
    ang_units = np.zeros(n_rows, np.float32)
    scales = np.full(n_rows, float(num_bins), np.float32)  # scale_div == 1
    ang = np.deg2rad(ang_units * np.float32(360.0 / 8196.0))
    tables = (scales / np.float32(num_bins), np.cos(ang), np.sin(ang))
    rows = np.zeros(4, np.uint16)
    bins = np.array([0, 1, 2, 3], np.uint16)  # x = 0, 1, 2, 3 exactly
    vals = np.full(4, 50.0, np.float32)

    x_edges = np.arange(0.0, 3.0 + 1.0, 1.0)  # edges at 0,1,2,3
    y_edges = np.arange(-1.0, 1.0 + 1.0, 1.0)
    nx, ny = len(x_edges) - 1, len(y_edges) - 1
    count = np.zeros(nx * ny, np.int64)
    isum = np.zeros(nx * ny, np.float64)
    native.land_grid_accumulate(rows, bins, vals, *tables,
                                x_edges, y_edges, count, isum)
    x = bins.astype(np.float32)
    y = np.zeros(4, np.float32)
    xi = np.clip(np.digitize(x, x_edges) - 1, 0, nx - 1)
    yi = np.clip(np.digitize(y, y_edges) - 1, 0, ny - 1)
    want = np.bincount(xi.astype(np.int64) * ny + yi, minlength=nx * ny)
    np.testing.assert_array_equal(count, want)
