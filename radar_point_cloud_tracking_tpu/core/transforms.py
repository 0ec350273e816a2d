"""Reference-named transform API (radar-pipeline core/transforms.py:13-263).

Thin host-facing adapters over the device ops so users of the reference
package find the same function names with the same semantics; heavy lifting
happens in ops/geometry.py and ops/intensity.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ProcessingConfig, RadarConfig
from ..ops import geometry as _geo
from ..ops.intensity import gain_constant_colors, intensity_to_grayscale
from .containers import PointCloud, RadarSweep

__all__ = [
    "polar_to_cartesian",
    "sweep_to_point_cloud",
    "sweep_to_points_simple",
    "subsample_cloud",
    "apply_stride",
    "apply_z_offset",
    "intensity_to_colors",
    "gain_to_colors",
]


def polar_to_cartesian(
    angles_rad: np.ndarray,
    ranges: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Polar (angles (N,), ranges (N, M)) -> Cartesian x/y on device."""
    x, y = _geo.polar_to_cartesian(jnp.asarray(angles_rad, jnp.float32),
                                   jnp.asarray(ranges, jnp.float32))
    return np.asarray(x), np.asarray(y)


def sweep_to_point_cloud(
    sweep: RadarSweep,
    config: Optional[ProcessingConfig] = None,
    radar_config: Optional[RadarConfig] = None,
) -> PointCloud:
    """Threshold + stride conversion (device), reference flat order."""
    return _geo.sweep_to_point_cloud_host(sweep, config, radar_config)


def sweep_to_points_simple(
    angles_rad: np.ndarray,
    intensities: np.ndarray,
    range_bin_width: float = 0.5,
    range_start: float = 0.0,
    min_intensity: float = 0.0,
    stride: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Uniform-bin conversion with row-index angles."""
    return _geo.sweep_to_points_simple(
        angles_rad, intensities, range_bin_width, range_start, min_intensity,
        stride)


def subsample_cloud(cloud: PointCloud, max_points: int,
                    seed: Optional[int] = 0) -> Tuple[PointCloud, int]:
    """Seeded random subsample (reference uses an unseeded
    ``np.random.choice``; determinism is a documented divergence)."""
    from ..models.cluster_ply import subsample_cloud as _impl

    return _impl(cloud, max_points, seed)


def apply_stride(cloud: PointCloud, stride: int) -> PointCloud:
    """Keep every Nth point (reference core/transforms.py:170-198)."""
    if stride <= 1:
        return cloud
    return PointCloud(
        x=cloud.x[::stride],
        y=cloud.y[::stride],
        z=cloud.z[::stride],
        colors=cloud.colors[::stride] if cloud.colors is not None else None,
    )


def apply_z_offset(cloud: PointCloud, offset: float) -> PointCloud:
    """Add a constant z offset (reference core/transforms.py:201-222)."""
    return PointCloud(x=cloud.x, y=cloud.y, z=cloud.z + offset,
                      colors=cloud.colors)


def intensity_to_colors(values: np.ndarray) -> np.ndarray:
    """Grayscale RGB from 0-255 intensities."""
    return np.asarray(intensity_to_grayscale(jnp.asarray(values)))


def gain_to_colors(values: np.ndarray, gain: int,
                   gain_colors: Dict[int, Tuple[int, int, int]]) -> np.ndarray:
    """Constant gain tint repeated per point."""
    return gain_constant_colors(int(np.asarray(values).size), gain,
                                gain_colors)
