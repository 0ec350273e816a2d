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
        tile=128, max_sweeps=32)
    labels, num_clusters, converged, state, records, stats = step(
        jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids))
    assert bool(converged)
    assert int(stats["label_overflow"]) == 0

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
        border_mode="if_earlier", tile=128,
        max_sweeps=32)
    labels, num_clusters, converged, state, records, stats = step(
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


def test_sharded_land_filter_matches_single_chip(mesh8):
    """The psum'd land filter uses the caller's exact np.arange edges, so
    per-point land verdicts — and everything downstream — match the
    single-chip ``land_filter_keep`` path exactly."""
    from radar_point_cloud_tracking_tpu.ops import grid as grid_ops

    xyi, count, frame_ids = _synthetic_frames()
    f, c, _ = xyi.shape
    valid = np.arange(c)[None, :] < count[:, None]

    # exact single-chip land semantics on the same flattened points
    xy = xyi[..., :2].reshape(f * c, 2)
    inten = xyi[..., 2].reshape(-1)
    v = valid.reshape(-1)
    x_min, x_max = xy[v, 0].min(), xy[v, 0].max()
    y_min, y_max = xy[v, 1].min(), xy[v, 1].max()
    x_edges = grid_ops.make_edges(float(x_min), float(x_max), 5.0)
    y_edges = grid_ops.make_edges(float(y_min), float(y_max), 5.0)
    nx, ny = len(x_edges) - 1, len(y_edges) - 1
    xe_d = jnp.asarray(grid_ops.edges_hilo(x_edges))
    ye_d = jnp.asarray(grid_ops.edges_hilo(y_edges))
    keep, n_land = grid_ops.land_filter_keep(
        jnp.asarray(xy), jnp.asarray(inten), jnp.asarray(v),
        xe_d, ye_d,
        nx, ny, jnp.int32(f), jnp.float32(0.5), jnp.float32(80.0))
    keep = np.asarray(keep)
    assert int(n_land) > 0  # the stationary blob cell qualifies as land

    # single-chip clustering with the land-filtered keep mask as validity
    want_dev, want_k_dev = st_dbscan_device(
        jnp.asarray(xy), jnp.asarray(np.repeat(frame_ids.astype(np.float32), c)),
        jnp.asarray(keep), EPS_SPACE, EPS_TIME, MIN_SAMPLES, tile=128)
    want_labels = np.asarray(want_dev).reshape(f, c)
    want_k = int(want_k_dev)

    step = sharded_tracking_step(
        mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
        land_grid_shape=(nx, ny), land_persistence=0.5,
        land_min_intensity=80.0, tile=128, max_sweeps=32)
    labels, num_clusters, converged, state, records, stats = step(
        jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids),
        xe_d, ye_d)
    assert bool(converged)
    labels = np.asarray(labels)
    assert labels.shape == xyi.shape[:2]
    np.testing.assert_array_equal(labels, want_labels)
    assert int(num_clusters) == want_k


def _ingested_from_frames(xyi, count, frame_ids):
    from radar_point_cloud_tracking_tpu.models.ingest import IngestedFrames

    return IngestedFrames(
        xyi=jnp.asarray(xyi), gain=jnp.asarray(
            np.full(xyi.shape[:2], 75, np.int32)),
        count=jnp.asarray(count), frame_ids=np.asarray(frame_ids, np.int32),
        timestamps_ms=np.asarray(frame_ids, np.int64) * 1000,
        count_host=np.asarray(count))


def test_sharded_frame_padding_matches_single_chip(mesh8):
    """Frame count NOT divisible by the usable mesh size: the padded empty
    frames (carrying the last real frame id) must be a no-op — results
    bit-match the single-chip engine."""
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.tracker import TrackingPipeline

    xyi, count, frame_ids = _synthetic_frames(f=13, c=64, seed=5)
    ingested = _ingested_from_frames(xyi, count, frame_ids)

    cfg = PipelineConfig()
    cfg.clustering.tile_size = 128
    pipe = TrackingPipeline(cfg, verbose=False)
    single = pipe.run_on_frames(ingested, eps_space=EPS_SPACE,
                                eps_time=EPS_TIME, min_samples=MIN_SAMPLES,
                                skip_land_filter=True, quiet_land_skip=True)
    cfg2 = PipelineConfig()
    cfg2.clustering.tile_size = 128
    cfg2.device.num_devices = 8  # halo cap reduces this to 6; f_pad=18 > 13
    pipe2 = TrackingPipeline(cfg2, verbose=False)
    sharded = pipe2.run_on_frames_sharded(
        ingested, eps_space=EPS_SPACE, eps_time=EPS_TIME,
        min_samples=MIN_SAMPLES, skip_land_filter=True)

    assert sharded.n_points == single.n_points
    assert sharded.num_clusters == single.num_clusters
    # the sharded gather is lazy: nothing bulky pulled until asked
    assert sharded._labels_np is None and sharded._points_np is None
    np.testing.assert_array_equal(sharded.labels, single.labels)
    np.testing.assert_allclose(sharded.points, single.points, rtol=0, atol=0)
    assert sharded.objects_rows() == single.objects_rows()
    assert sharded.trajectory_rows() == single.trajectory_rows()
    assert sharded.cluster_rows() == single.cluster_rows()


def test_sharded_bounded_candidate_width_detects_overflow(mesh8):
    """An undersized static k_pad must be DETECTED via stats['max_cand'];
    retrying with the reported width reproduces the unbounded result."""
    xyi, count, frame_ids = _synthetic_frames(f=16, c=64, seed=2)
    args = (jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids))

    full = sharded_tracking_step(mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                                 tile=64, max_sweeps=32, k_pad=0)
    want_labels, want_k, *_rest, want_stats = full(*args)
    max_cand = int(want_stats["max_cand"])
    assert max_cand > 2, "fixture too sparse to exercise the bound"

    tiny = sharded_tracking_step(mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                                 tile=64, max_sweeps=32, k_pad=2)
    *_ignored, tiny_stats = tiny(*args)
    assert int(tiny_stats["max_cand"]) == max_cand  # overflow is visible

    retry = sharded_tracking_step(mesh8, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                                  tile=64, max_sweeps=32,
                                  k_pad=1 << (max_cand - 1).bit_length())
    labels, num_clusters, *_r2, stats = retry(*args)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(want_labels))
    assert int(num_clusters) == int(want_k)


def test_sharded_scale_100k_points_per_shard(mesh8):
    """Non-toy scale: ~131k points per shard across 4 shards with a BOUNDED
    candidate table (no O(num_tiles^2) structure) exact-matches the
    single-chip engine."""
    from radar_point_cloud_tracking_tpu.parallel.mesh import make_frames_mesh

    rng = np.random.default_rng(9)
    f, c = 8, 65536
    xyi = np.full((f, c, 3), 1e9, np.float32)
    count = np.zeros((f,), np.int32)
    for fi in range(f):
        # 150 compact blobs scattered over 40 km: dense enough to cluster,
        # sparse enough that tile candidate lists stay narrow (and the
        # replicated tracker's Hungarian capacity stays modest)
        centers = rng.uniform(-20_000, 20_000, (150, 2))
        blob = (np.repeat(centers, 400, axis=0)
                + rng.normal(0, 0.8, (60_000, 2)))
        clutter = rng.uniform(-20_000, 20_000, (5_000, 2))
        pts = np.concatenate([blob, clutter]).astype(np.float32)
        inten = rng.uniform(50, 255, len(pts)).astype(np.float32)
        arr = np.column_stack([pts, inten])
        xyi[fi, :len(arr)] = arr
        count[fi] = len(arr)
    frame_ids = np.arange(f, dtype=np.int32)

    mesh4 = make_frames_mesh(4)
    step = sharded_tracking_step(mesh4, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                                 tile=512, max_sweeps=32, k_pad=128,
                                 label_cap=4096, max_clusters=256,
                                 max_objects=512)
    labels, num_clusters, converged, state, records, stats = step(
        jnp.asarray(xyi), jnp.asarray(count), jnp.asarray(frame_ids))
    assert bool(converged)
    # the static width covers this scene while staying far below the dense
    # num_tiles (= 512 per shard) table the unbounded build would allocate
    assert int(stats["max_cand"]) <= 128, "bounded table overflowed"
    assert int(stats["label_overflow"]) == 0

    valid = np.arange(c)[None, :] < count[:, None]
    want, want_k = st_dbscan_device(
        jnp.asarray(xyi[..., :2].reshape(f * c, 2)),
        jnp.asarray(np.repeat(frame_ids.astype(np.float32), c)),
        jnp.asarray(valid.reshape(-1)), EPS_SPACE, EPS_TIME, MIN_SAMPLES,
        tile=512)
    np.testing.assert_array_equal(
        np.asarray(labels), np.asarray(want).reshape(f, c))
    assert int(num_clusters) == int(want_k)
    assert int(num_clusters) > 500  # the scene really has that many clusters


def test_user_surface_sharded_matches_single_chip(mesh8, gain_dataset,
                                                  tmp_path):
    """`device.num_devices > 1` drives run_tracking_pipeline through the
    frame-sharded mesh path end-to-end; CSV artifacts match single-chip."""
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.tracker import (
        run_tracking_pipeline,
    )

    def run(n_devices, out):
        cfg = PipelineConfig()
        cfg.radar.num_echo_columns = 64
        cfg.device.num_devices = n_devices
        cfg.land_filter.min_frames_required = 2
        cfg.clustering.tile_size = 128
        return run_tracking_pipeline(
            gain_dataset, tmp_path / out, eps_space=8.0, eps_time=2.0,
            min_samples=5, intensity_threshold=10.0, point_stride=2,
            visualize=False, config=cfg, verbose=False)

    single = run(0, "single")
    sharded = run(8, "sharded")
    assert sharded.n_points == single.n_points
    assert sharded.num_clusters == single.num_clusters
    np.testing.assert_array_equal(sharded.labels, single.labels)
    assert sharded.objects_rows() == single.objects_rows()
    assert sharded.cluster_rows() == single.cluster_rows()
    assert sharded.trajectory_rows() == single.trajectory_rows()
    for name in ("tracked_objects.csv", "trajectories.csv", "clusters.csv"):
        a = (tmp_path / "single" / name).read_text()
        b = (tmp_path / "sharded" / name).read_text()
        assert a == b, f"{name} differs between single-chip and sharded"


def test_denoise_frames_sharded_matches_single_chip():
    """The user-surface sharded denoiser (denoise_frames_sharded — frame-
    INDEX time axis, min_frames persistence, if_earlier borders, no land
    filter) must reproduce the single-chip denoiser exactly, including a
    frame count not divisible by the mesh (13 over 6 shards)."""
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        denoise_frames, denoise_frames_sharded)

    xyi, count, frame_ids = _synthetic_frames(f=13, c=64, seed=3)
    # non-contiguous real frame ids: the denoiser's time axis must be the
    # POSITION, not the id, and ids must still ride into the artifacts
    ingested = _ingested_from_frames(xyi, count, frame_ids * 7 + 3)
    cfg = PipelineConfig()

    ref = denoise_frames(ingested, 3.0, 2.0, 5, 2, cfg, verbose=False)
    out = denoise_frames_sharded(ingested, 3.0, 2.0, 5, 2, cfg,
                                 n_devices=6, verbose=False)
    assert out.num_clusters == ref.num_clusters
    assert out.n_points == ref.n_points
    assert np.array_equal(out.labels, ref.labels)
    assert np.allclose(out.points, ref.points)
    assert out.stats == ref.stats
    want = sorted((r["cluster_id"], r["num_points"])
                  for r in ref.cluster_table)
    got = sorted((r["cluster_id"], r["num_points"])
                 for r in out.cluster_table)
    assert got == want
