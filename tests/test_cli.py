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
