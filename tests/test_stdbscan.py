"""Device ST-DBSCAN exact-match tests against the sequential CPU oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan, st_dbscan_device
from radar_point_cloud_tracking_tpu.reference_impl.oracle import oracle_st_dbscan


def _check(coords, times, eps_space, eps_time, min_samples, min_frames=1,
           border_mode="always"):
    got = st_dbscan(coords, times, eps_space, eps_time, min_samples,
                    min_frames=min_frames, border_mode=border_mode)
    want = oracle_st_dbscan(coords, times, eps_space, eps_time, min_samples,
                            min_frames=min_frames, border_mode=border_mode)
    np.testing.assert_array_equal(got, want)
    return got


def test_two_spatial_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1.0, (40, 2))
    b = rng.normal(50, 1.0, (35, 2))
    coords = np.vstack([a, b]).astype(np.float32)
    times = np.zeros(75, dtype=np.float32)
    labels = _check(coords, times, 3.0, 0.5, 5)
    assert set(labels[:40]) == {0}
    assert set(labels[40:]) == {1}


def test_noise_points():
    rng = np.random.default_rng(1)
    cluster = rng.normal(0, 0.5, (30, 2))
    noise = np.array([[100.0, 100.0], [-100.0, 50.0], [200.0, -30.0]])
    coords = np.vstack([cluster, noise]).astype(np.float32)
    times = np.zeros(33, dtype=np.float32)
    labels = _check(coords, times, 2.0, 0.5, 5)
    assert np.all(labels[30:] == -1)


def test_temporal_separation():
    """Same location, far-apart times -> separate clusters."""
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 0.5, (30, 2)).astype(np.float32)
    coords = np.vstack([pts, pts])
    times = np.concatenate([np.zeros(30), np.full(30, 10.0)]).astype(np.float32)
    labels = _check(coords, times, 2.0, 1.0, 5)
    assert labels[0] != labels[30]
    assert set(labels) == {0, 1}


def test_min_frames_kills_single_frame_blob():
    rng = np.random.default_rng(3)
    # blob A appears in frames 0..3; blob B only in frame 1
    a = [rng.normal((0, 0), 0.5, (10, 2)) + 0 for f in range(4)]
    a_pts = np.vstack(a)
    a_t = np.repeat(np.arange(4), 10)
    b_pts = rng.normal((30, 30), 0.5, (25, 2))
    b_t = np.full(25, 1)
    coords = np.vstack([a_pts, b_pts]).astype(np.float32)
    times = np.concatenate([a_t, b_t]).astype(np.float32)

    labels_nf = _check(coords, times, 3.0, 2.0, 8, min_frames=1)
    assert set(labels_nf[40:]) == {labels_nf[40]} and labels_nf[40] >= 0

    labels_mf = _check(coords, times, 3.0, 2.0, 8, min_frames=2)
    assert np.all(labels_mf[40:] == -1)  # single-frame blob suppressed
    assert np.all(labels_mf[:40] >= 0)


def test_border_point_tiebreak():
    """A point within eps of cores of two clusters joins the earlier one."""
    # two dense vertical bars 10 apart; a lone point midway between them
    bar1 = np.stack([np.zeros(20), np.linspace(0, 4, 20)], axis=1)
    bar2 = np.stack([np.full(20, 10.0), np.linspace(0, 4, 20)], axis=1)
    mid = np.array([[5.0, 2.0]])
    coords = np.vstack([bar1, bar2, mid]).astype(np.float32)
    times = np.zeros(len(coords), dtype=np.float32)
    labels = _check(coords, times, 5.5, 1.0, 10)
    # mid point is border to both; oracle assigns first-created cluster
    assert labels[-1] == labels[0]


def test_empty_and_single():
    assert st_dbscan(np.empty((0, 2), np.float32), np.empty(0), 1, 1, 3).size == 0
    labels = _check(np.array([[1.0, 2.0]], np.float32), np.zeros(1), 1.0, 1.0, 2)
    assert labels[0] == -1
    labels = _check(np.array([[1.0, 2.0]], np.float32), np.zeros(1), 1.0, 1.0, 1)
    assert labels[0] == 0


def test_3d_coords_ply_semantics():
    """Package clustering runs on x,y,z(=intensity) 3D coords."""
    rng = np.random.default_rng(4)
    a = rng.normal((0, 0, 100), 1.0, (30, 3))
    b = rng.normal((20, 0, 100), 1.0, (30, 3))
    coords = np.vstack([a, b]).astype(np.float32)
    times = np.tile([0.0, 1.0, 2.0], 20).astype(np.float32)
    _check(coords, times, 4.0, 1.0, 5)


def test_random_dense_field_many_params():
    rng = np.random.default_rng(5)
    coords = (rng.random((400, 2)) * 60).astype(np.float32)
    times = rng.integers(0, 5, 400).astype(np.float32)
    for eps_space, eps_time, min_samples, min_frames in [
        (4.0, 1.0, 6, 1),
        (4.0, 2.0, 6, 2),
        (7.0, 4.5, 10, 3),
        (2.0, 0.0, 3, 1),
    ]:
        for border_mode in ("always", "if_earlier"):
            _check(coords, times, eps_space, eps_time, min_samples,
                   min_frames, border_mode)


def test_padded_input_matches_unpadded():
    rng = np.random.default_rng(6)
    coords = (rng.random((100, 2)) * 30).astype(np.float32)
    times = rng.integers(0, 3, 100).astype(np.float32)
    n_pad = 156
    coords_p = np.full((n_pad, 2), 1e9, dtype=np.float32)
    coords_p[:100] = coords
    times_p = np.zeros(n_pad, dtype=np.float32)
    times_p[:100] = times
    valid = np.zeros(n_pad, dtype=bool)
    valid[:100] = True

    labels_p, _ = st_dbscan_device(
        jnp.asarray(coords_p), jnp.asarray(times_p), jnp.asarray(valid),
        3.0, 1.0, 5, tile=64)
    want = oracle_st_dbscan(coords, times, 3.0, 1.0, 5)
    np.testing.assert_array_equal(np.asarray(labels_p)[:100], want)
    assert np.all(np.asarray(labels_p)[100:] == -1)


def test_multiple_tiles_small_tile_size():
    """Force many tiles so pruning + cross-tile propagation is exercised."""
    rng = np.random.default_rng(7)
    # one long snake cluster spanning many cells + background noise
    t = np.linspace(0, 60, 300)
    snake = np.stack([t, 5 * np.sin(t / 5)], axis=1)
    snake += rng.normal(0, 0.2, snake.shape)
    noise = rng.random((100, 2)) * [80, 40] - [10, 20]
    coords = np.vstack([snake, noise]).astype(np.float32)
    times = np.zeros(len(coords), dtype=np.float32)

    got, _ = st_dbscan_device(
        jnp.asarray(coords), jnp.asarray(times),
        jnp.ones(len(coords), bool), 1.5, 1.0, 4, tile=64)
    want = oracle_st_dbscan(coords, times, 1.5, 1.0, 4)
    np.testing.assert_array_equal(np.asarray(got), want)
