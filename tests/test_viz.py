"""Visualization smoke tests (Agg backend, CPU)."""

from pathlib import Path

import numpy as np
import pytest

from radar_point_cloud_tracking_tpu.core.containers import PointCloud
from radar_point_cloud_tracking_tpu.viz.plotting import (
    labels_to_colors,
    plot_labeled_cloud,
    plot_point_cloud,
)
from radar_point_cloud_tracking_tpu.viz.raster import (
    CLUSTER_PALETTE,
    render_scatter_png,
)


def _cloud(n=200, seed=0):
    rng = np.random.default_rng(seed)
    return PointCloud(
        x=rng.random(n).astype(np.float32) * 100,
        y=rng.random(n).astype(np.float32) * 100,
        z=rng.random(n).astype(np.float32) * 255,
        colors=rng.integers(0, 256, (n, 3)).astype(np.uint8),
    )


def test_labels_to_colors_noise_gray():
    labels = np.array([-1, 0, 0, 1])
    colors = labels_to_colors(labels)
    np.testing.assert_array_equal(colors[0], [120, 120, 120])
    np.testing.assert_array_equal(colors[1], colors[2])
    assert not np.array_equal(colors[1], colors[3])


def test_labels_to_colors_uses_original():
    labels = np.array([0, 0, 1])
    orig = np.array([[10, 20, 30], [10, 20, 30], [40, 50, 60]], np.uint8)
    colors = labels_to_colors(labels, orig)
    np.testing.assert_array_equal(colors[0], [10, 20, 30])
    np.testing.assert_array_equal(colors[2], [40, 50, 60])


def test_plot_point_cloud(tmp_path):
    out = tmp_path / "cloud.png"
    plot_point_cloud(out, _cloud(), title="test")
    assert out.exists() and out.stat().st_size > 1000


def test_plot_labeled_cloud(tmp_path):
    cloud = _cloud()
    labels = np.repeat(np.arange(4), 50)
    out = tmp_path / "labeled.png"
    plot_labeled_cloud(out, cloud.to_coords(), labels)
    assert out.exists()


def test_device_rasterizer(tmp_path):
    rng = np.random.default_rng(1)
    n = 5000
    x = rng.random(n).astype(np.float32) * 100
    y = rng.random(n).astype(np.float32) * 50
    labels = rng.integers(-1, 5, n)
    out = render_scatter_png(tmp_path / "raster.png", x, y, labels=labels,
                             width=320, height=200)
    assert out.exists()
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (200, 320, 3)
    # some pixels hit (non-white), background white
    assert (img < 250).any()
    assert (img == 255).any()


def test_rasterizer_palette_and_orientation(tmp_path):
    # one red-palette point at (0, 0), image corner checks
    x = np.array([0.0, 10.0], np.float32)
    y = np.array([0.0, 10.0], np.float32)
    labels = np.array([0, 1])
    out = render_scatter_png(tmp_path / "two.png", x, y, labels=labels,
                             width=64, height=64, pad_fraction=0.0)
    from PIL import Image

    img = np.asarray(Image.open(out))
    # y-up: point (0,0) renders at bottom-left, (10,10) at top-right
    np.testing.assert_array_equal(img[63, 0], CLUSTER_PALETTE[0])
    np.testing.assert_array_equal(img[0, 63], CLUSTER_PALETTE[1])
