"""Device tracker scan vs the sequential CPU oracle tracker."""

import numpy as np

from radar_point_cloud_tracking_tpu.config import TrackingConfig
from radar_point_cloud_tracking_tpu.ops.tracking import (
    TYPE_BOAT,
    TYPE_BUOY,
    TYPE_UNKNOWN,
    track_sequence_host,
)
from radar_point_cloud_tracking_tpu.reference_impl.oracle import OracleTracker

_TYPE_NAME = {TYPE_UNKNOWN: "unknown", TYPE_BUOY: "buoy", TYPE_BOAT: "boat"}


def _run_both(centroids_list, frame_ids, cfg=None):
    if cfg is None:
        cfg = TrackingConfig(max_objects=32, max_clusters_per_frame=8)
    state, records = track_sequence_host(centroids_list, frame_ids, cfg)

    oracle = OracleTracker(
        max_association_distance=cfg.max_association_distance,
        max_missed_frames=cfg.max_missed_frames,
        stationary_velocity_threshold=cfg.stationary_velocity_threshold,
        motion_history_frames=cfg.motion_history_frames,
    )
    for cents, fid in zip(centroids_list, frame_ids):
        oracle.update(np.asarray(cents, np.float64).reshape(-1, 2), int(fid))
    return state, records, oracle


def _device_summary(state):
    rows = []
    for slot in np.nonzero(state.active)[0]:
        rows.append({
            "object_id": int(state.object_id[slot]),
            "object_type": _TYPE_NAME[int(state.type_code[slot])],
            "num_frames_seen": int(state.frames_seen[slot]),
            "first_frame": int(state.first_frame[slot]),
            "last_frame": int(state.last_seen[slot]),
            "final_x": float(state.last_pos[slot, 0]),
            "final_y": float(state.last_pos[slot, 1]),
        })
    return sorted(rows, key=lambda r: r["object_id"])


def _compare(state, oracle, atol=1e-3):
    got = _device_summary(state)
    want = sorted(oracle.summary(), key=lambda r: r["object_id"])
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert g["object_id"] == w["object_id"]
        assert g["object_type"] == w["object_type"], (g, w)
        assert g["num_frames_seen"] == w["num_frames_seen"], (g, w)
        assert g["first_frame"] == w["first_frame"]
        assert g["last_frame"] == w["last_frame"]
        assert abs(g["final_x"] - w["final_x"]) < atol
        assert abs(g["final_y"] - w["final_y"]) < atol


def test_single_stationary_object_becomes_buoy():
    frames = [np.array([[10.0, 20.0]]) + np.array([[0.01, -0.01]]) * i
              for i in range(10)]
    state, records, oracle = _run_both(frames, list(range(10)))
    _compare(state, oracle)
    assert _device_summary(state)[0]["object_type"] == "buoy"


def test_moving_object_becomes_boat():
    frames = [np.array([[5.0 * i, 0.0]]) for i in range(10)]
    state, records, oracle = _run_both(frames, list(range(10)))
    _compare(state, oracle)
    assert _device_summary(state)[0]["object_type"] == "boat"


def test_two_objects_crossing():
    frames = []
    for i in range(12):
        frames.append(np.array([
            [3.0 * i, 10.0],        # boat moving right
            [36.0 - 3.0 * i, 12.0],  # boat moving left
        ]))
    state, records, oracle = _run_both(frames, list(range(12)))
    _compare(state, oracle)


def test_object_lost_and_deleted():
    """Object seen for 3 frames then gone: deleted after max_missed."""
    frames = [np.array([[0.0, 0.0]])] * 3 + [np.zeros((0, 2))] * 15
    state, records, oracle = _run_both(frames, list(range(18)))
    _compare(state, oracle)
    assert len(_device_summary(state)) == 0  # deleted


def test_reappearing_object_gets_new_id():
    frames = ([np.array([[0.0, 0.0]])] * 2
              + [np.zeros((0, 2))] * 12
              + [np.array([[0.5, 0.5]])] * 3)
    state, records, oracle = _run_both(frames, list(range(17)))
    _compare(state, oracle)
    rows = _device_summary(state)
    assert len(rows) == 1 and rows[0]["object_id"] == 2


def test_clutter_and_multiple_objects_random():
    rng = np.random.default_rng(11)
    frames = []
    # two persistent objects + random clutter appearing/disappearing
    for i in range(25):
        cents = [
            np.array([1.5 * i, 0.0]) + rng.normal(0, 0.2, 2),
            np.array([100.0, 50.0]) + rng.normal(0, 0.3, 2),
        ]
        for _ in range(rng.integers(0, 3)):
            cents.append(rng.uniform(-200, 200, 2))
        frames.append(np.stack(cents))
    state, records, oracle = _run_both(frames, list(range(25)))
    _compare(state, oracle)


def test_gating_prevents_wild_association():
    """A detection jumping >max_dist creates a new object."""
    frames = [np.array([[0.0, 0.0]]), np.array([[200.0, 200.0]]),
              np.array([[200.0, 201.0]]), np.array([[200.0, 202.0]])]
    state, records, oracle = _run_both(frames, list(range(4)))
    _compare(state, oracle)
    rows = _device_summary(state)
    assert {r["object_id"] for r in rows} == {1, 2}


def test_gap_frames_velocity_normalization():
    """Association across a 3-frame gap divides velocity by elapsed frames."""
    frames = [np.array([[0.0, 0.0]]), np.zeros((0, 2)), np.zeros((0, 2)),
              np.array([[9.0, 0.0]]), np.array([[12.0, 0.0]]),
              np.array([[15.0, 0.0]]), np.array([[18.0, 0.0]]),
              np.array([[21.0, 0.0]])]
    state, records, oracle = _run_both(frames, list(range(8)))
    _compare(state, oracle)


def test_record_vel_is_mean_of_last_three_velocities():
    """records['vel'] mirrors the reference viz arrows: mean of
    velocities[-3:] where velocities = [0 (creation), v1, v2, ...]
    (4_temporal_object_tracker.py:751) — even after the ring wraps."""
    # positions 0, 1, 3, 6, 10, 15, 21, 28 -> velocities 1..7
    xs = np.cumsum([0, 1, 2, 3, 4, 5, 6, 7]).astype(float)
    frames = [np.array([[x, 0.0]]) for x in xs]
    state, records, _ = _run_both(frames, list(range(len(xs))))
    slot = 0
    # frame 1: velocities=[0, 1] -> mean 0.5
    np.testing.assert_allclose(records["vel"][1, slot], [0.5, 0.0],
                               atol=1e-5)
    # frame 3: velocities=[0, 1, 2, 3] -> last 3 = [1, 2, 3] -> mean 2
    np.testing.assert_allclose(records["vel"][3, slot], [2.0, 0.0],
                               atol=1e-5)
    # final frame (ring wrapped, count=8 > history=5): last 3 = [5, 6, 7]
    np.testing.assert_allclose(records["vel"][-1, slot], [6.0, 0.0],
                               atol=1e-5)


def test_object_table_overflow_is_reported():
    """Creations beyond free slots are counted in records['dropped'],
    never silently swallowed."""
    from radar_point_cloud_tracking_tpu.config import TrackingConfig

    cfg = TrackingConfig(max_objects=2, max_clusters_per_frame=8)
    frames = [np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0],
                        [100.0, 100.0]])] * 3
    from radar_point_cloud_tracking_tpu.ops.tracking import (
        track_sequence_host,
    )
    state, records = track_sequence_host(frames, list(range(3)), cfg)
    assert int(records["dropped"][0]) == 2
    # the two surviving objects still track exactly
    assert int(np.sum(state.active)) == 2


def test_cluster_stats_overflow_is_reported():
    import jax.numpy as jnp

    from radar_point_cloud_tracking_tpu.ops.cluster_stats import (
        per_frame_cluster_stats,
    )

    # 5 clusters in one frame, max_clusters=2, label_cap=4 (label 4 overflows)
    labels = np.array([0, 1, 2, 3, 4, 4], np.int32)
    xy = np.arange(12, dtype=np.float32).reshape(6, 2)
    cs = per_frame_cluster_stats(
        jnp.asarray(xy), jnp.ones(6), jnp.zeros(6, jnp.int32),
        jnp.asarray(labels), jnp.ones(6, bool),
        num_frames=1, label_cap=4, max_clusters=2)
    assert int(cs.label_overflow) == 2  # two points with label >= 4
    assert int(cs.present_count[0]) == 4  # labels 0..3 present pre-truncation
    assert int(np.sum(np.asarray(cs.valid))) == 2  # table truncated to 2


def test_trajectory_records_match_oracle():
    frames = [np.array([[2.0 * i, 1.0], [50.0, 50.0]]) for i in range(8)]
    state, records, oracle = _run_both(frames, list(range(8)))
    # reconstruct trajectories from records for surviving objects
    surviving = {int(state.object_id[s]) for s in np.nonzero(state.active)[0]}
    got = []
    for f in range(8):
        for slot in range(records["seen"].shape[1]):
            if records["seen"][f, slot]:
                oid = int(records["object_id"][f, slot])
                if oid in surviving:
                    got.append((oid, f, float(records["pos"][f, slot, 0]),
                                float(records["pos"][f, slot, 1])))
    want = [(r["object_id"], r["frame_id"], r["x"], r["y"])
            for r in oracle.trajectories()]
    got.sort()
    want.sort()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-3 and abs(g[3] - w[3]) < 1e-3
