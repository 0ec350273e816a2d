"""Gain-fusion builder + grid ops vs oracle."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.config import PipelineConfig
from radar_point_cloud_tracking_tpu.models.fusion_builder import (
    build_gain_comparison,
    build_individual_frames,
    build_stacked_sequence,
    fuse_gains_max,
)
from radar_point_cloud_tracking_tpu.ops.intensity import (
    intensity_to_heat_rgb,
    normalize_intensity,
)
from radar_point_cloud_tracking_tpu.reference_impl.oracle import oracle_fuse_max


@pytest.fixture
def fusion_config():
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    cfg.fusion.intensity_threshold = 5.0
    cfg.fusion.point_stride = 2
    return cfg


def test_fuse_max_matches_oracle():
    rng = np.random.default_rng(0)
    n = 500
    x = (rng.random(n) * 80 - 40).astype(np.float32)
    y = (rng.random(n) * 80 - 40).astype(np.float32)
    z = rng.uniform(10, 250, n).astype(np.float32)
    xyi = np.full((2048, 3), 1e9, np.float32)
    xyi[:n, 0], xyi[:n, 1], xyi[:n, 2] = x, y, z
    gx, gy, gz = fuse_gains_max(xyi, n, grid_resolution=1.0)
    ox, oy, oz = oracle_fuse_max(x, y, z, 1.0)
    np.testing.assert_allclose(gx, ox, atol=1e-4)
    np.testing.assert_allclose(gy, oy, atol=1e-4)
    np.testing.assert_allclose(gz, oz, atol=1e-4)


def test_normalize_intensity_percentile():
    vals = np.linspace(0, 1000, 200).astype(np.float32)
    out = np.asarray(normalize_intensity(jnp.asarray(vals), None, 99.0))
    # reference semantics: percentile-99 maps to 255; everything clipped
    max_val = np.percentile(vals, 99)
    want = np.clip((vals - vals.min()) / (max_val - vals.min()) * 255, 0, 255)
    np.testing.assert_allclose(out, want, atol=0.2)


def test_heat_colormap_endpoints():
    rgb = np.asarray(intensity_to_heat_rgb(
        jnp.asarray([0.0, 63.0, 127.0, 191.0, 255.0])))
    np.testing.assert_array_equal(rgb[0], [0, 0, 255])  # blue at 0
    assert rgb[1][1] > 200 and rgb[1][2] > 200  # cyan-ish
    np.testing.assert_array_equal(rgb[4], [255, 0, 0])  # red at max


def test_build_individual_frames(gain_dataset, tmp_path, fusion_config):
    out = tmp_path / "fused"
    n = build_individual_frames(gain_dataset, out, max_frames=2,
                                mode="absolute", config=fusion_config,
                                verbose=False)
    assert n == 2
    plys = sorted(out.glob("frame_*_gains_*.ply"))
    assert len(plys) == 2
    cloud = rpt.load_ply(plys[0])
    assert cloud.size > 0
    assert cloud.z.max() <= 255.0 + 1e-3  # normalized intensity as z


def test_build_individual_frames_max_mode(gain_dataset, tmp_path,
                                          fusion_config):
    out = tmp_path / "fusedmax"
    n = build_individual_frames(gain_dataset, out, max_frames=1, mode="max",
                                config=fusion_config, verbose=False)
    assert n == 1
    cloud = rpt.load_ply(next(iter(out.glob("*.ply"))))
    assert cloud.size > 0


def test_build_stacked_sequence(gain_dataset, tmp_path, fusion_config):
    path = build_stacked_sequence(gain_dataset, tmp_path / "stack",
                                  max_frames=3, time_spacing=10.0,
                                  config=fusion_config, verbose=False)
    cloud = rpt.load_ply(path)
    zs = np.unique(cloud.z)
    assert set(zs).issubset({0.0, 10.0, 20.0})  # frame-index layers


def test_build_gain_comparison(gain_dataset, tmp_path, fusion_config):
    outputs = build_gain_comparison(gain_dataset, tmp_path / "cmp", 0,
                                    config=fusion_config, verbose=False)
    assert {"gain_40", "gain_50", "gain_75", "fused_by_gain",
            "fused_by_intensity"} <= set(outputs)
    fused = rpt.load_ply(outputs["fused_by_gain"])
    per_gain = sum(rpt.load_ply(outputs[f"gain_{g}"]).size
                   for g in (40, 50, 75))
    assert fused.size == per_gain
