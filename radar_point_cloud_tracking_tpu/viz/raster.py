"""Device-side point-cloud rasterization.

The reference's native visualization is a Rust/plotters bitmap scatter
renderer (radar-pipeline-rs visualization/mod.rs:58-245: 1920x1080 bitmap,
bounds + 5% padding, 15-color cluster palette).  The TPU-native equivalent
rasterizes on device: points scatter-max into an (H, W) image with one XLA
program — orders of magnitude faster than per-point CPU pixel writes for
large clouds — and the bitmap is PNG-encoded on host via PIL.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rasterize_points", "render_scatter_png", "CLUSTER_PALETTE"]

# 15-color cluster palette (distinct hues for label coloring, mirroring the
# reference's fixed palette idea at visualization/mod.rs:37-53)
CLUSTER_PALETTE = np.array([
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (230, 190, 255),
    (170, 110, 40), (128, 0, 0), (128, 128, 0),
], dtype=np.uint8)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def rasterize_points(
    x: jnp.ndarray,
    y: jnp.ndarray,
    colors: jnp.ndarray,  # (N, 3) uint8
    valid: jnp.ndarray,
    bounds: jnp.ndarray,  # (4,) x_min, x_max, y_min, y_max (padded)
    width: int,
    height: int,
) -> jnp.ndarray:
    """Scatter points into an (H, W, 3) uint8 image (white background).

    Y axis points up (row 0 = max y), matching plot conventions.  Overlaps
    resolve by channel-wise max of the packed color (deterministic).
    """
    x_min, x_max, y_min, y_max = bounds[0], bounds[1], bounds[2], bounds[3]
    sx = (width - 1) / jnp.maximum(x_max - x_min, 1e-9)
    sy = (height - 1) / jnp.maximum(y_max - y_min, 1e-9)
    px = jnp.clip(((x - x_min) * sx).astype(jnp.int32), 0, width - 1)
    py = jnp.clip(((y_max - y) * sy).astype(jnp.int32), 0, height - 1)
    flat = jnp.where(valid, py * width + px, width * height)

    # pack RGB into one int for a single scatter-max, then unpack
    c = colors.astype(jnp.uint32)
    packed = (c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]
    img = jnp.zeros((width * height + 1,), jnp.uint32).at[flat].max(
        jnp.where(valid, packed, 0), mode="drop")[:-1]
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    hit = img > 0
    rgb = jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
    white = jnp.full_like(rgb, 255)
    out = jnp.where(hit[:, None], rgb, white)
    return out.reshape(height, width, 3)


def render_scatter_png(
    path: Path,
    x: np.ndarray,
    y: np.ndarray,
    colors: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    width: int = 1920,
    height: int = 1080,
    pad_fraction: float = 0.05,
) -> Path:
    """Rasterize a (possibly huge) point cloud to PNG on device.

    ``labels`` selects palette colors (noise -1 = gray); otherwise
    ``colors`` is used directly (default black).
    """
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    n = x.size
    if labels is not None:
        labels = np.asarray(labels)
        colors = np.where(
            labels[:, None] < 0,
            np.array([150, 150, 150], np.uint8),
            CLUSTER_PALETTE[np.abs(labels) % len(CLUSTER_PALETTE)])
    elif colors is None:
        colors = np.zeros((n, 3), np.uint8)

    x_min, x_max = float(x.min()), float(x.max())
    y_min, y_max = float(y.min()), float(y.max())
    pad_x = (x_max - x_min) * pad_fraction if x_max > x_min else 1.0
    pad_y = (y_max - y_min) * pad_fraction if y_max > y_min else 1.0
    bounds = jnp.asarray([x_min - pad_x, x_max + pad_x,
                          y_min - pad_y, y_max + pad_y], jnp.float32)

    img = np.asarray(rasterize_points(
        jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(colors, dtype=jnp.uint8),
        jnp.ones((n,), bool), bounds, width, height))

    from PIL import Image

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(path)
    return path
