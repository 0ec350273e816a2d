"""End-to-end tracker pipeline vs a CPU oracle composition (exact match)."""

from pathlib import Path

import numpy as np
import pytest

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.core.loaders import load_radar_table
from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
from radar_point_cloud_tracking_tpu.models.tracker import (
    TrackingPipeline,
    run_tracking_pipeline,
)
from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
    OracleTracker,
    oracle_convert_sweep,
    oracle_st_dbscan,
)

EPS_SPACE, EPS_TIME, MIN_SAMPLES = 8.0, 2.0, 5
THRESHOLD, STRIDE = 10.0, 2


def _oracle_pipeline(data_dir: Path, num_echo=64):
    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)
    frames = []  # (frame_id, points (N,3), gains (N,))
    for i, ff in enumerate(frame_files):
        xs, ys, zs, gs = [], [], [], []
        for gain in sorted(ff):
            table = load_radar_table(ff[gain], num_echo)
            if not table.shape[0]:
                continue
            angles = np.deg2rad(table[:, 4] * np.float32(360.0 / 8196.0))
            x, y, z = oracle_convert_sweep(
                table[:, 5:], angles, table[:, 1], THRESHOLD, STRIDE)
            if len(x):
                xs.append(x)
                ys.append(y)
                zs.append(z)
                gs.append(np.full(len(x), gain))
        if xs:
            pts = np.column_stack([np.concatenate(xs), np.concatenate(ys),
                                   np.concatenate(zs)])
            frames.append((i, pts, np.concatenate(gs)))

    coords = np.concatenate([p[:, :2] for _, p, _ in frames])
    times = np.concatenate(
        [np.full(len(p), fid, np.float32) for fid, p, _ in frames])
    labels = oracle_st_dbscan(coords, times, EPS_SPACE, EPS_TIME, MIN_SAMPLES)

    tracker = OracleTracker()
    offset = 0
    cluster_rows = []
    for fid, pts, _ in frames:
        n = len(pts)
        fl = labels[offset:offset + n]
        cents = []
        for lbl in sorted(set(fl[fl >= 0])):
            m = fl == lbl
            c = pts[m, :2].mean(axis=0)
            cents.append(c)
            cluster_rows.append({
                "frame_id": fid, "cluster_id": int(lbl),
                "num_points": int(m.sum()),
                "centroid_x": c[0], "centroid_y": c[1],
                "mean_intensity": pts[m, 2].mean(),
            })
        tracker.update(np.asarray(cents).reshape(-1, 2), fid)
        offset += n
    return frames, labels, cluster_rows, tracker


@pytest.fixture
def device_result(gain_dataset):
    files_by_gain = rpt.discover_files(gain_dataset)
    frame_files = rpt.group_files_by_frame(files_by_gain)
    loader = FrameBatchLoader(intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=4096)
    loader.config.radar.num_echo_columns = 64
    ingested = loader.load_sequence(frame_files)
    pipe = TrackingPipeline(verbose=False)
    return pipe.run_on_frames(ingested, eps_space=EPS_SPACE,
                              eps_time=EPS_TIME, min_samples=MIN_SAMPLES)


def test_capacity_autogrow_matches_default(gain_dataset, device_result):
    """Undersized object/cluster tables grow-and-retry: results identical to
    a run with ample capacity (never silently truncated)."""
    from radar_point_cloud_tracking_tpu.config import PipelineConfig

    files_by_gain = rpt.discover_files(gain_dataset)
    frame_files = rpt.group_files_by_frame(files_by_gain)
    loader = FrameBatchLoader(intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=4096)
    loader.config.radar.num_echo_columns = 64
    ingested = loader.load_sequence(frame_files)

    cfg = PipelineConfig()
    cfg.tracking.max_objects = 1
    cfg.tracking.max_clusters_per_frame = 1
    pipe = TrackingPipeline(cfg, verbose=False)
    small = pipe.run_on_frames(ingested, eps_space=EPS_SPACE,
                               eps_time=EPS_TIME, min_samples=MIN_SAMPLES)

    got = small.objects_rows()
    want = device_result.objects_rows()
    assert len(got) == len(want) and len(want) >= 2
    for g, w in zip(got, want):
        for k in ("object_id", "object_type", "num_frames_seen",
                  "first_frame", "last_frame"):
            assert g[k] == w[k], (k, g, w)
        for k in ("avg_velocity", "final_x", "final_y"):
            assert abs(g[k] - w[k]) < 1e-5, (k, g, w)
    assert int(np.sum(small.records["dropped"])) == 0


def test_frame_grouping(gain_dataset):
    files_by_gain = rpt.discover_files(gain_dataset)
    assert set(files_by_gain) == {40, 50, 75}
    frames = rpt.group_files_by_frame(files_by_gain)
    assert len(frames) == 4
    assert all(len(ff) == 3 for ff in frames)


def test_ingest_matches_oracle_conversion(gain_dataset):
    oracle_frames, _, _, _ = _oracle_pipeline(gain_dataset)
    files_by_gain = rpt.discover_files(gain_dataset)
    frame_files = rpt.group_files_by_frame(files_by_gain)
    loader = FrameBatchLoader(intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=4096)
    loader.config.radar.num_echo_columns = 64
    ingested = loader.load_sequence(frame_files)
    assert ingested.num_frames == len(oracle_frames)
    for fi, (fid, pts, gains) in enumerate(oracle_frames):
        n = int(ingested.count[fi])
        assert n == len(pts)
        got = np.asarray(ingested.xyi[fi])[:n]
        np.testing.assert_allclose(got[:, 0], pts[:, 0], rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(got[:, 1], pts[:, 1], rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(got[:, 2], pts[:, 2])
        np.testing.assert_array_equal(
            np.asarray(ingested.gain[fi])[:n], gains)


def test_sparse_ingest_matches_dense(gain_dataset):
    """Host-compacted (native) ingest == full-grid device ingest, exactly."""
    from radar_point_cloud_tracking_tpu import native

    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    files_by_gain = rpt.discover_files(gain_dataset)
    frame_files = rpt.group_files_by_frame(files_by_gain)

    results = []
    for sparse in (False, True):
        loader = FrameBatchLoader(intensity_threshold=THRESHOLD,
                                  point_stride=STRIDE, verbose=False,
                                  frame_capacity=4096, sparse=sparse)
        loader.config.radar.num_echo_columns = 64
        results.append(loader.load_sequence(frame_files))
    dense, sparse_r = results
    np.testing.assert_array_equal(np.asarray(dense.count),
                                  np.asarray(sparse_r.count))
    for fi in range(dense.num_frames):
        n = int(dense.count[fi])
        np.testing.assert_allclose(
            np.asarray(sparse_r.xyi[fi])[:n], np.asarray(dense.xyi[fi])[:n],
            rtol=1e-6, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(sparse_r.gain[fi])[:n], np.asarray(dense.gain[fi])[:n])


def test_cluster_labels_exact_match(gain_dataset, device_result):
    _, oracle_labels, _, _ = _oracle_pipeline(gain_dataset)
    np.testing.assert_array_equal(device_result.labels, oracle_labels)


def test_cluster_stats_match(gain_dataset, device_result):
    _, _, oracle_rows, _ = _oracle_pipeline(gain_dataset)
    got_rows = device_result.cluster_rows()
    assert len(got_rows) == len(oracle_rows)
    for g, w in zip(got_rows, oracle_rows):
        assert g["frame_id"] == w["frame_id"]
        assert g["cluster_id"] == w["cluster_id"]
        assert g["num_points"] == w["num_points"]
        assert abs(g["centroid_x"] - w["centroid_x"]) < 1e-3
        assert abs(g["mean_intensity"] - w["mean_intensity"]) < 1e-2


def test_tracked_objects_match(gain_dataset, device_result):
    _, _, _, oracle_tracker = _oracle_pipeline(gain_dataset)
    got = device_result.objects_rows()
    want = sorted(oracle_tracker.summary(), key=lambda r: r["object_id"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["object_id"] == w["object_id"]
        assert g["object_type"] == w["object_type"]
        assert g["num_frames_seen"] == w["num_frames_seen"]
        assert abs(g["final_x"] - w["final_x"]) < 1e-3


def test_full_pipeline_writes_artifacts(gain_dataset, tmp_path):
    from radar_point_cloud_tracking_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    out = tmp_path / "results"
    result = run_tracking_pipeline(
        gain_dataset, out, eps_space=EPS_SPACE, eps_time=EPS_TIME,
        min_samples=MIN_SAMPLES, intensity_threshold=THRESHOLD,
        point_stride=STRIDE, config=cfg, verbose=False, visualize=False)
    assert (out / "tracked_objects.csv").exists()
    assert (out / "trajectories.csv").exists()
    assert (out / "clusters.csv").exists()
    import pandas as pd

    traj = pd.read_csv(out / "trajectories.csv")
    assert set(traj.columns) == {"object_id", "object_type", "frame_id", "x", "y"}
    assert len(traj) > 0


def test_full_pipeline_with_visualizations(gain_dataset, tmp_path):
    """End-to-end incl. the viz suite (frame plots + summary)."""
    from radar_point_cloud_tracking_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    out = tmp_path / "viz_results"
    run_tracking_pipeline(
        gain_dataset, out, eps_space=EPS_SPACE, eps_time=EPS_TIME,
        min_samples=MIN_SAMPLES, intensity_threshold=THRESHOLD,
        point_stride=STRIDE, config=cfg, verbose=False, visualize=True)
    assert (out / "tracking_summary.png").exists()
    frames = list((out / "visualizations").glob("frame_*.png"))
    assert len(frames) >= 1


def test_load_points_auto(gain_dataset, sample_cartesian_csv):
    from radar_point_cloud_tracking_tpu.config import RadarConfig

    cart = rpt.load_points_auto(sample_cartesian_csv)
    assert cart.size == 3
    radar_csv = next(iter((gain_dataset / "gain_40").glob("*.csv")))
    cloud = rpt.load_points_auto(radar_csv, RadarConfig(num_echo_columns=64))
    assert cloud.size > 0


def test_parse_u8_flag_and_float_fallback(tmp_path):
    """The native parser flags whether echoes fit the uint8 wire; fractional
    echoes force the float32 wide layout, and both ship exact values."""
    from radar_point_cloud_tracking_tpu import native

    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    hdr = "Status,Scale,Range,Gain,Angle," + ",".join(
        f"Echo_{i}" for i in range(8))
    f_int = tmp_path / "int.csv"
    f_int.write_text(hdr + "\n1,496,3,40,0,0,0,12,0,255,0,0,0\n")
    f_frac = tmp_path / "frac.csv"
    f_frac.write_text(hdr + "\n1,496,3,40,0,0,0,12.5,0,300.25,0,0,0\n")

    *_, u8_int = native.parse_radar_points(f_int, 8, 0.0, 1, 16, 64)
    assert u8_int is True
    r, b, v, *_rest, u8_frac = native.parse_radar_points(
        f_frac, 8, 0.0, 1, 16, 64)
    assert u8_frac is False
    np.testing.assert_array_equal(v, np.float32([12.5, 300.25]))


@pytest.mark.parametrize("mode", ["f32_payload", "wide_layout", "int32_keys"])
def test_sparse_packed_fallbacks_identical(gain_dataset, monkeypatch, mode):
    """Neither fallback (float32 payload; unpacked wide layout) may change
    any output vs the packed uint8 wire."""
    from radar_point_cloud_tracking_tpu import native
    from radar_point_cloud_tracking_tpu.models import ingest as ingest_mod

    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    frame_files = rpt.group_files_by_frame(rpt.discover_files(gain_dataset))

    def load(force_fallback):
        loader = FrameBatchLoader(intensity_threshold=THRESHOLD,
                                  point_stride=STRIDE, verbose=False,
                                  frame_capacity=4096, sparse=True)
        loader.config.radar.num_echo_columns = 64
        if force_fallback:
            if mode == "wide_layout":
                # overflow the packed index budget -> wide fallback
                monkeypatch.setattr(ingest_mod, "_PACK_LIMIT_BITS", 0)
            elif mode == "int32_keys":
                # overflow the uint16 delta budget -> int32 packed keys
                monkeypatch.setattr(ingest_mod, "_DELTA_MAX", -1)
            else:
                orig = FrameBatchLoader._convert_chunk_sparse

                def no_u8(self, chunk_sweeps, rows):
                    return orig(self, [
                        [(g, r, b, v, a, s, False) for (g, r, b, v, a, s, _)
                         in sweeps] for sweeps in chunk_sweeps], rows)

                monkeypatch.setattr(FrameBatchLoader,
                                    "_convert_chunk_sparse", no_u8)
        fr = loader.load_sequence(frame_files)
        monkeypatch.undo()
        return fr

    packed, wide = load(False), load(True)
    np.testing.assert_array_equal(np.asarray(packed.count),
                                  np.asarray(wide.count))
    np.testing.assert_array_equal(np.asarray(packed.gain),
                                  np.asarray(wide.gain))
    np.testing.assert_array_equal(np.asarray(packed.xyi),
                                  np.asarray(wide.xyi))


def test_host_land_prefilter_matches_device_path(gain_dataset):
    """Host-side land prefiltering (filter before the host->device wire)
    produces bit-identical labels/objects to the on-device land stage."""
    from radar_point_cloud_tracking_tpu.config import PipelineConfig

    files_by_gain = rpt.discover_files(gain_dataset)
    frame_files = rpt.group_files_by_frame(files_by_gain)

    def run(host_prefilter):
        cfg = PipelineConfig()
        cfg.radar.num_echo_columns = 64
        cfg.land_filter.min_frames_required = 2  # activate on 4 frames
        cfg.land_filter.host_prefilter = host_prefilter
        loader = FrameBatchLoader(cfg, intensity_threshold=THRESHOLD,
                                  point_stride=STRIDE, verbose=False,
                                  frame_capacity=4096)
        pipe = TrackingPipeline(cfg, verbose=True)
        return pipe.ingest_and_run(frame_files, loader, EPS_SPACE, EPS_TIME,
                                   MIN_SAMPLES)

    dev = run(False)
    pre = run(True)
    assert pre.land_points_removed > 0  # the persistent blobs are land
    assert dev.n_points == pre.n_points
    assert dev.num_clusters == pre.num_clusters
    np.testing.assert_array_equal(dev.labels, pre.labels)
    np.testing.assert_array_equal(dev.points, pre.points)
    assert dev.objects_rows() == pre.objects_rows()
    assert dev.land_points_removed == pre.land_points_removed
    assert dev.land_cells == pre.land_cells


def test_tracking_result_repr_skips_device_buffers(device_result):
    # dataclass __repr__ must not format the device-side buffers (it would
    # force the bulk d2h the lazy properties exist to avoid)
    r = repr(device_result)
    for name in ("points_dev", "labels_dev", "records_dev",
                 "cluster_stats_dev", "ingested"):
        assert name not in r
