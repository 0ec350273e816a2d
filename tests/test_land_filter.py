"""Land-filter exactness vs the sequential oracle, and equivalence of the
fused device program to the 3-op composition (ops/grid.py)."""

import jax.numpy as jnp
import numpy as np

import radar_point_cloud_tracking_tpu.ops.grid as grid_ops
from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
    oracle_filter_land,
    oracle_land_mask,
    oracle_occupancy_grid,
)

RES = 5.0


def _scene(num_frames=12, seed=3):
    """Persistent high-intensity block (land) + transient noise."""
    rng = np.random.default_rng(seed)
    frames_xy, frames_int = [], []
    for _ in range(num_frames):
        # land block: dense, present every frame, intensity ~200
        gx, gy = np.meshgrid(np.linspace(10, 40, 12), np.linspace(-20, 5, 10))
        land_xy = np.stack([gx.ravel(), gy.ravel()], 1)
        land_xy = land_xy + rng.normal(0, 0.5, land_xy.shape)
        land_i = rng.uniform(150, 255, len(land_xy))
        # transient noise: uniform, low persistence per cell
        n = rng.integers(40, 80)
        noise_xy = rng.uniform(-80, 80, (n, 2))
        noise_i = rng.uniform(20, 255, n)
        frames_xy.append(np.vstack([land_xy, noise_xy]).astype(np.float32))
        frames_int.append(np.concatenate([land_i, noise_i]).astype(np.float32))
    return frames_xy, frames_int


def test_land_filter_matches_oracle():
    frames_xy, frames_int = _scene()
    f = len(frames_xy)
    count_o, isum_o, (xe, ye) = oracle_occupancy_grid(frames_xy, frames_int, RES)
    land_o = oracle_land_mask(count_o, isum_o, f, 0.8, 100.0)
    keep_o = np.concatenate([
        oracle_filter_land(xy, land_o, (xe, ye)) for xy in frames_xy])

    # device path: flattened padded buffer
    all_xy = np.vstack(frames_xy)
    all_i = np.concatenate(frames_int)
    pad = 37  # some padding slots
    n = len(all_xy)
    xy_p = np.vstack([all_xy, np.full((pad, 2), 1e9, np.float32)])
    i_p = np.concatenate([all_i, np.zeros(pad, np.float32)])
    valid = np.arange(n + pad) < n
    nx, ny = len(xe) - 1, len(ye) - 1
    keep_d, n_land = grid_ops.land_filter_keep(
        jnp.asarray(xy_p), jnp.asarray(i_p), jnp.asarray(valid),
        jnp.asarray(grid_ops.edges_hilo(xe)),
        jnp.asarray(grid_ops.edges_hilo(ye)),
        nx, ny, jnp.int32(f), jnp.float32(0.8), jnp.float32(100.0))
    keep_d = np.asarray(keep_d)
    assert int(n_land) == int(land_o.sum()) > 0
    np.testing.assert_array_equal(keep_d[:n], keep_o)
    assert not keep_d[n:].any()  # padding never kept
    assert keep_o.sum() < n  # the filter actually removed something


def test_exact_digitize_matches_float64_on_edge_straddling_points():
    """Points within f32 rounding of a float64 bin edge: the (hi, lo)
    device digitize must agree with np.digitize on the TRUE edges, where
    the plain f32-rounded-edge comparison provably diverges."""
    rng = np.random.default_rng(7)
    # float64 edges whose f32 roundings move (non-representable values)
    edges = grid_ops.make_edges(-1234.567, 8000.0, 5.0)
    hi = edges.astype(np.float32)
    assert np.any(hi.astype(np.float64) != edges)
    n_cells = len(edges) - 1
    # adversarial values: the f32 edge roundings themselves (ties with hi,
    # decided by lo's sign) plus their f32 neighbors and random fill
    vals = np.concatenate([
        hi[1:-1],
        np.nextafter(hi[1:-1], np.float32(np.inf), dtype=np.float32),
        np.nextafter(hi[1:-1], np.float32(-np.inf), dtype=np.float32),
        rng.uniform(edges[0], edges[-1], 500).astype(np.float32),
    ])
    want = np.clip(np.digitize(vals.astype(np.float64), edges) - 1,
                   0, n_cells - 1)
    got = np.asarray(grid_ops.digitize_clip(
        jnp.asarray(vals), jnp.asarray(grid_ops.edges_hilo(edges)), n_cells))
    np.testing.assert_array_equal(got, want)
    # sanity: the rounded-edge path really does differ on this input set
    # (otherwise this test would not be exercising the correction)
    approx = np.asarray(grid_ops.digitize_clip(
        jnp.asarray(vals), jnp.asarray(hi), n_cells))
    assert np.any(approx != want)


def test_fused_equals_composition():
    frames_xy, frames_int = _scene(num_frames=6, seed=11)
    f = len(frames_xy)
    all_xy = jnp.asarray(np.vstack(frames_xy))
    all_i = jnp.asarray(np.concatenate(frames_int))
    valid = jnp.ones(all_xy.shape[0], bool)
    xe = grid_ops.make_edges(float(all_xy[:, 0].min()),
                             float(all_xy[:, 0].max()), RES)
    ye = grid_ops.make_edges(float(all_xy[:, 1].min()),
                             float(all_xy[:, 1].max()), RES)
    nx, ny = len(xe) - 1, len(ye) - 1
    xe_d = jnp.asarray(grid_ops.edges_hilo(xe))
    ye_d = jnp.asarray(grid_ops.edges_hilo(ye))
    args = (jnp.int32(f), jnp.float32(0.5), jnp.float32(80.0))

    count, isum = grid_ops.occupancy_grid(
        all_xy, all_i, valid, valid.astype(jnp.float32), xe_d, ye_d, nx, ny)
    land = grid_ops.land_mask_from_grids(count, isum, *args)
    keep_c = grid_ops.land_keep_mask(all_xy, valid, land, xe_d, ye_d)

    keep_f, n_land = grid_ops.land_filter_keep(
        all_xy, all_i, valid, xe_d, ye_d, nx, ny, *args)
    np.testing.assert_array_equal(np.asarray(keep_f), np.asarray(keep_c))
    assert int(n_land) == int(jnp.sum(land))
