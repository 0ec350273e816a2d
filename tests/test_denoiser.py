"""Denoising pipeline vs oracle (min_frames + denoiser border semantics)."""

from pathlib import Path

import numpy as np
import pytest

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.config import PipelineConfig
from radar_point_cloud_tracking_tpu.core.loaders import load_radar_table
from radar_point_cloud_tracking_tpu.models.denoiser import (
    denoise_frames,
    run_denoising_pipeline,
)
from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
    oracle_convert_sweep,
    oracle_st_dbscan,
)

EPS_SPACE, EPS_TIME, MIN_SAMPLES, MIN_FRAMES = 8.0, 2.0, 5, 2
THRESHOLD, STRIDE = 10.0, 2


def _oracle_denoise(data_dir: Path, num_echo=64):
    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)
    pts_list, t_list = [], []
    for i, ff in enumerate(frame_files):
        for gain in sorted(ff):
            table = load_radar_table(ff[gain], num_echo)
            angles = np.deg2rad(table[:, 4] * np.float32(360.0 / 8196.0))
            x, y, z = oracle_convert_sweep(
                table[:, 5:], angles, table[:, 1], THRESHOLD, STRIDE)
            if len(x):
                pts_list.append(np.column_stack([x, y, z]))
                t_list.append(np.full(len(x), i, np.float32))
    pts = np.concatenate(pts_list)
    times = np.concatenate(t_list)
    labels = oracle_st_dbscan(pts[:, :2], times, EPS_SPACE, EPS_TIME,
                              MIN_SAMPLES, min_frames=MIN_FRAMES,
                              border_mode="if_earlier")
    return pts, times, labels


@pytest.fixture
def denoise_result(gain_dataset):
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    loader = FrameBatchLoader(cfg, intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=4096)
    files_by_gain = rpt.discover_files(gain_dataset)
    frame_files = rpt.group_files_by_frame(files_by_gain)
    ingested = loader.load_sequence(frame_files)
    return denoise_frames(ingested, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                          MIN_FRAMES, cfg, verbose=False)


def test_denoise_labels_exact_match(gain_dataset, denoise_result):
    _, _, want = _oracle_denoise(gain_dataset)
    np.testing.assert_array_equal(denoise_result.labels, want)


def test_denoise_stats_match(gain_dataset, denoise_result):
    pts, _, want = _oracle_denoise(gain_dataset)
    st = denoise_result.stats
    assert st["total_points"] == len(pts)
    assert st["noise_points"] == int((want == -1).sum())
    assert st["signal_points"] == int((want >= 0).sum())
    assert st["num_clusters"] == len(np.unique(want[want >= 0]))


def test_denoise_cluster_table(gain_dataset, denoise_result):
    pts, _, want = _oracle_denoise(gain_dataset)
    table = {r["cluster_id"]: r for r in denoise_result.cluster_table}
    for lbl in np.unique(want[want >= 0]):
        m = want == lbl
        row = table[int(lbl)]
        assert row["num_points"] == int(m.sum())
        assert abs(row["centroid_x"] - pts[m, 0].mean()) < 1e-3
        assert abs(row["mean_intensity"] - pts[m, 2].mean()) < 1e-2


def test_denoise_full_pipeline_artifacts(gain_dataset, tmp_path):
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    out = tmp_path / "denoise_out"
    result = run_denoising_pipeline(
        gain_dataset, out, eps_space=EPS_SPACE, eps_time=EPS_TIME,
        min_samples=MIN_SAMPLES, min_frames=MIN_FRAMES, max_frames=0,
        no_viz=True, intensity_threshold=THRESHOLD, point_stride=STRIDE,
        config=cfg, verbose=False)
    assert (out / "denoised_point_cloud.ply").exists()
    assert (out / "raw_point_cloud.ply").exists()
    assert (out / "denoising_stats.csv").exists()
    # binary PLY round-trips with the right point counts
    raw = rpt.load_ply(out / "raw_point_cloud.ply")
    assert raw.size == result.stats["total_points"]
    den = rpt.load_ply(out / "denoised_point_cloud.ply")
    assert den.size == result.stats["signal_points"]


def test_denoise_result_repr_skips_device_buffers(denoise_result):
    # dataclass __repr__ must not format the device arrays (that would force
    # the bulk d2h the lazy properties exist to avoid)
    r = repr(denoise_result)
    assert "points_dev" not in r and "labels_dev" not in r


def test_denoise_low_memory_bitequal(gain_dataset, denoise_result):
    """low_memory=True (free padded ingest buffers post-repack) must not
    change a single output bit; the ingest buffers really are released."""
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    loader = FrameBatchLoader(cfg, intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=4096)
    files_by_gain = rpt.discover_files(gain_dataset)
    ingested = loader.load_sequence(rpt.group_files_by_frame(files_by_gain))
    lm = denoise_frames(ingested, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                        MIN_FRAMES, cfg, verbose=False, low_memory=True)
    np.testing.assert_array_equal(lm.labels, denoise_result.labels)
    np.testing.assert_array_equal(lm.points, denoise_result.points)
    assert lm.stats == denoise_result.stats
    assert ingested.xyi.is_deleted()


def test_denoise_cli_low_memory_parse_workers(gain_dataset, tmp_path):
    """CLI parity flags (--low-memory / --parse-workers) drive a full run
    whose stats match the default run."""
    from click.testing import CliRunner

    from radar_point_cloud_tracking_tpu.cli.main import cli

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text("radar:\n  num_echo_columns: 64\n")
    runner = CliRunner()
    outs = {}
    for name, extra in (("default", []),
                        ("lowmem", ["--low-memory", "--parse-workers", "2"])):
        out = tmp_path / name
        r = runner.invoke(cli, [
            "-c", str(cfg_path), "denoise", "--data-dir", str(gain_dataset),
            "--output-dir", str(out), "--min-samples", str(MIN_SAMPLES),
            "--min-frames", str(MIN_FRAMES), "--no-viz", "--skip-gif",
        ] + extra)
        assert r.exit_code == 0, r.output
        outs[name] = (out / "denoising_stats.csv").read_bytes()
    assert outs["default"] == outs["lowmem"]
