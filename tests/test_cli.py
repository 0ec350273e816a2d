"""CLI smoke tests (parity with reference tests/test_cli.py)."""

from pathlib import Path

import pytest
from click.testing import CliRunner

from radar_point_cloud_tracking_tpu.cli import cli
from tests.conftest import make_radar_csv


@pytest.fixture
def runner():
    return CliRunner()


def test_version(runner):
    result = runner.invoke(cli, ["--version"])
    assert result.exit_code == 0
    assert "0.1" in result.output


@pytest.mark.parametrize("cmd", [
    "sort-by-gain", "filter-range", "convert", "build", "visualize",
    "cluster", "track", "denoise", "fuse", "experiment",
])
def test_subcommand_help(runner, cmd):
    result = runner.invoke(cli, [cmd, "--help"])
    assert result.exit_code == 0, result.output


def test_sort_by_gain_dry_run(runner, tmp_path):
    for i, gain in enumerate([40, 75]):
        make_radar_csv(tmp_path / f"20250813_1426{10 + i:02d}_000.csv",
                       num_rows=2, num_echo=8, gain=gain)
    result = runner.invoke(cli, ["sort-by-gain", str(tmp_path), "--dry-run"])
    assert result.exit_code == 0, result.output
    assert "Would move 2 file(s)" in result.output
    assert len(list(tmp_path.glob("*.csv"))) == 2


def test_filter_range_dry_run(runner, tmp_path):
    g = tmp_path / "gain_40"
    g.mkdir()
    make_radar_csv(g / "20250813_142610_000.csv", num_rows=2, num_echo=8,
                   gain=40, range_val=1)
    result = runner.invoke(cli, ["filter-range", str(tmp_path), "--dry-run"])
    assert result.exit_code == 0, result.output
    assert "Would remove 1 file(s)" in result.output


def test_convert_single(runner, tmp_path, small_radar_csv):
    out = tmp_path / "converted.csv"
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("radar:\n  num_echo_columns: 8\n")
    result = runner.invoke(cli, ["-c", str(cfg), "convert",
                                 str(small_radar_csv), str(out),
                                 "-t", "30.0"])
    assert result.exit_code == 0, result.output
    assert out.exists()


def test_config_yaml_roundtrip(tmp_path):
    from radar_point_cloud_tracking_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg.clustering.eps_space = 12.5
    cfg.gains.values = (40, 70)
    path = tmp_path / "cfg.yaml"
    cfg.to_yaml(path)
    loaded = PipelineConfig.from_yaml(path)
    assert loaded.clustering.eps_space == 12.5
    assert tuple(loaded.gains.values) == (40, 70)
    assert loaded.radar.num_echo_columns == 1024  # default preserved


def test_config_partial_yaml(tmp_path):
    from radar_point_cloud_tracking_tpu.config import PipelineConfig

    path = tmp_path / "partial.yaml"
    path.write_text("clustering:\n  eps_space: 3.0\n")
    cfg = PipelineConfig.from_yaml(path)
    assert cfg.clustering.eps_space == 3.0
    assert cfg.clustering.min_samples == 10


# ---------------------------------------------------------------------------
# Heavy-driver smoke tests: every pipeline subcommand exercised end-to-end
# through click on tiny fixtures (the reference only smoke-tests --help,
# tests/test_cli.py:16-88).
# ---------------------------------------------------------------------------


@pytest.fixture
def cli_config(tmp_path):
    """Config YAML matching the tiny fixtures (64 echo columns)."""
    path = tmp_path / "config.yaml"
    path.write_text(
        "radar:\n  num_echo_columns: 64\n"
        "clustering:\n  tile_size: 128\n"
        "land_filter:\n  min_frames_required: 2\n")
    return path


def test_track_cli_end_to_end(runner, gain_dataset, tmp_path, cli_config):
    out = tmp_path / "track_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "track", "--data-dir", str(gain_dataset),
        "--output-dir", str(out), "--min-samples", "5",
        "--intensity-threshold", "10", "--no-viz"])
    assert result.exit_code == 0, result.output
    for name in ("tracked_objects.csv", "trajectories.csv", "clusters.csv"):
        assert (out / name).exists(), name


def test_track_cli_sharded_devices(runner, gain_dataset, tmp_path,
                                   cli_config):
    """--devices routes through the frame-sharded mesh path."""
    out = tmp_path / "track8"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "track", "--data-dir", str(gain_dataset),
        "--output-dir", str(out), "--min-samples", "5",
        "--intensity-threshold", "10", "--no-viz", "--devices", "8"])
    assert result.exit_code == 0, result.output
    assert (out / "tracked_objects.csv").exists()


def test_build_cli_end_to_end(runner, tmp_path, cli_config):
    # build consumes a flat dir of gain-tagged CSVs (convert --batch output)
    src = tmp_path / "sweeps"
    src.mkdir()
    for gain in (40, 50, 75):
        (src / f"0000_gain_{gain}_cartesian.csv").write_text(
            "x,y,z\n" + "\n".join(
                f"{i + gain}.0,{i * 2}.0,{100 + i}" for i in range(20)) + "\n")
    out = tmp_path / "build_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "build", str(src), str(out), "--no-plot"])
    assert result.exit_code == 0, result.output
    plys = list(out.glob("*.ply"))
    assert plys, "build produced no PLY files"


def test_cluster_cli_end_to_end(runner, tmp_path, cli_config):
    # a PLY with one dense blob (cluster) and far-away noise
    rng = __import__("numpy").random.default_rng(0)
    blob = rng.normal(0.0, 0.5, (30, 3)).astype("f4")
    noise = rng.uniform(100, 200, (5, 3)).astype("f4")
    pts = __import__("numpy").concatenate([blob, noise])
    lines = ["ply", "format ascii 1.0", f"element vertex {len(pts)}",
             "property float x", "property float y", "property float z",
             "end_header"]
    lines += [f"{p[0]} {p[1]} {p[2]}" for p in pts]
    ply = tmp_path / "blob.ply"
    ply.write_text("\n".join(lines) + "\n")
    out = tmp_path / "cluster_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "cluster", str(ply), "-o", str(out),
        "--eps-space", "3", "--min-samples", "5", "--no-plot"])
    assert result.exit_code == 0, result.output
    assert list(Path(out).glob("*labels*.csv")), "no labels CSV written"


def test_denoise_cli_end_to_end(runner, gain_dataset, tmp_path, cli_config):
    out = tmp_path / "denoise_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "denoise", "--data-dir", str(gain_dataset),
        "--output-dir", str(out), "--min-samples", "5", "--min-frames", "2",
        "--no-viz", "--skip-gif"])
    assert result.exit_code == 0, result.output
    assert (out / "denoising_stats.csv").exists()


def test_denoise_cli_with_gif(runner, gain_dataset, tmp_path, cli_config):
    """Full denoise e2e with visualizations AND the comparison GIF (the one
    e2e that exercises the GIF path; the others pass --skip-gif)."""
    out = tmp_path / "denoise_gif_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "denoise", "--data-dir", str(gain_dataset),
        "--output-dir", str(out), "--min-samples", "5", "--min-frames", "2"])
    assert result.exit_code == 0, result.output
    assert (out / "denoising_stats.csv").exists()
    gif = out / "stdbscan_comparison.gif"
    assert gif.exists() and gif.stat().st_size > 0
    assert not (out / "_temp_frames").exists()


def test_fuse_cli_end_to_end(runner, gain_dataset, tmp_path, cli_config):
    out = tmp_path / "fuse_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "fuse", "individual", "--data-dir",
        str(gain_dataset), "--output-dir", str(out), "--max-frames", "2"])
    assert result.exit_code == 0, result.output
    assert list(out.glob("*.ply")), "fuse produced no PLYs"


def test_visualize_cli_end_to_end(runner, sample_ply, tmp_path):
    png = tmp_path / "preview.png"
    result = runner.invoke(cli, [
        "visualize", str(sample_ply), "-o", str(png)])
    assert result.exit_code == 0, result.output
    assert png.exists()


def test_experiment_cli_quick(runner, gain_dataset, tmp_path, cli_config):
    out = tmp_path / "exp_out"
    result = runner.invoke(cli, [
        "-c", str(cli_config), "experiment", "--data-dir", str(gain_dataset),
        "--output-dir", str(out), "--max-frames", "4", "--quick"])
    assert result.exit_code == 0, result.output
    assert (out / "experiment_results.json").exists() or \
        list(out.glob("*.json")), "no experiment JSON written"
