"""Multi-chip sharded pipeline vs single-chip results on a CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radar_point_cloud_tracking_tpu.parallel.mesh import make_frames_mesh
from radar_point_cloud_tracking_tpu.parallel.pipeline import (
    sharded_tracking_step,
)
from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan_device
from radar_point_cloud_tracking_tpu.ops.tracking import track_sequence
from radar_point_cloud_tracking_tpu.ops.cluster_stats import (
    per_frame_cluster_stats,
)

EPS_SPACE, EPS_TIME, MIN_SAMPLES = 5.0, 2.0, 4


def _synthetic_frames(f=16, c=64, seed=0):
    """Moving blob + stationary blob + sparse noise per frame."""
    rng = np.random.default_rng(seed)
    xyi = np.full((f, c, 3), 1e9, np.float32)
    count = np.zeros((f,), np.int32)
    for fi in range(f):
        pts = []
        blob = rng.normal((2.0 * fi, 0.0), 0.4, (12, 2))
        pts.append(np.column_stack([blob, np.full(12, 120.0)]))
        blob2 = rng.normal((40.0, 30.0), 0.4, (10, 2))
        pts.append(np.column_stack([blob2, np.full(10, 90.0)]))
        noise = rng.uniform(-60, 100, (5, 2))
        pts.append(np.column_stack([noise, rng.uniform(20, 40, 5)]))
        arr = np.concatenate(pts).astype(np.float32)
        xyi[fi, :len(arr)] = arr
        count[fi] = len(arr)
    frame_ids = np.arange(f, dtype=np.int32)
    return xyi, count, frame_ids


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_frames_mesh(8)


def _single_chip_reference(xyi, count, frame_ids):
    f, c, _ = xyi.shape
    valid = np.arange(c)[None, :] < count[:, None]
    coords = xyi[..., :2].reshape(f * c, 2)
    times = np.repeat(frame_ids.astype(np.float32), c)
    labels, num_clusters = st_dbscan_device(
        jnp.asarray(coords), jnp.asarray(times),
        jnp.asarray(valid.reshape(-1)), EPS_SPACE, EPS_TIME, MIN_SAMPLES,
        tile=128)
    labels = np.asarray(labels).reshape(f, c)

    cs = per_frame_cluster_stats(
        jnp.asarray(coords), jnp.asarray(xyi[..., 2].reshape(-1)),
        jnp.asarray(np.repeat(np.arange(f, dtype=np.int32), c)),
        jnp.asarray(labels.reshape(-1)), jnp.asarray(valid.reshape(-1)),
        num_frames=f, label_cap=256, max_clusters=32)
    state, records = track_sequence(
        cs.centroids, cs.valid, jnp.asarray(frame_ids), max_objects=64, history=5,
        max_missed=10, max_dist=50.0, stationary=1.0)
    return labels, int(num_clusters), state, records


def test_sharded_step_matches_single_chip(mesh8):
    xyi, count, frame_ids = _synthetic_frames()
    step = sharded_tracking_step(
        mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
        land_persistence=2.0,  # disable land filtering (persistence > 1)
        tile=128, max_sweeps=32)
    labels, num_clusters, converged, state, records = step(
        jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids))
    assert bool(converged)

    want_labels, want_k, want_state, want_records = _single_chip_reference(
        xyi, count, frame_ids)

    np.testing.assert_array_equal(np.asarray(labels), want_labels)
    assert int(num_clusters) == want_k
    np.testing.assert_array_equal(np.asarray(state.active),
                                  np.asarray(want_state.active))
    np.testing.assert_array_equal(np.asarray(state.object_id),
                                  np.asarray(want_state.object_id))
    np.testing.assert_allclose(np.asarray(state.last_pos),
                               np.asarray(want_state.last_pos), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(state.type_code),
                                  np.asarray(want_state.type_code))


def test_sharded_denoise_semantics_match_single_chip(mesh8):
    """min_frames + if_earlier border semantics across shards == single chip."""
    xyi, count, frame_ids = _synthetic_frames(seed=3)
    step = sharded_tracking_step(
        mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES, min_frames=2,
        border_mode="if_earlier", land_persistence=2.0, tile=128,
        max_sweeps=32)
    labels, num_clusters, converged, state, records = step(
        jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids))
    assert bool(converged)

    f, c, _ = xyi.shape
    valid = np.arange(c)[None, :] < count[:, None]
    want, want_k = st_dbscan_device(
        jnp.asarray(xyi[..., :2].reshape(f * c, 2)),
        jnp.asarray(np.repeat(frame_ids.astype(np.float32), c)),
        jnp.asarray(valid.reshape(-1)), EPS_SPACE, EPS_TIME, MIN_SAMPLES,
        min_frames=2, border_mode="if_earlier", tile=128)
    np.testing.assert_array_equal(
        np.asarray(labels), np.asarray(want).reshape(f, c))
    assert int(num_clusters) == int(want_k)


def test_sharded_step_with_land_filter_runs(mesh8):
    """Smoke: the psum'd occupancy-grid land filter executes and removes the
    high-intensity persistent returns (persistence is point-count based like
    the reference, so both dense blobs qualify as 'land' here)."""
    xyi, count, frame_ids = _synthetic_frames()
    step = sharded_tracking_step(
        mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
        land_persistence=0.5, land_min_intensity=80.0,
        tile=128, max_sweeps=32)
    labels, num_clusters, converged, state, records = step(
        jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids))
    assert bool(converged)
    labels = np.asarray(labels)
    assert labels.shape == xyi.shape[:2]
    # dense blobs (intensity >= 80) filtered out -> only sparse noise left,
    # which cannot form clusters
    assert int(num_clusters) == 0
    assert np.all(labels == -1)
