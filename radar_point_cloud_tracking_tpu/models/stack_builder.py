"""Stacked point-cloud builder: per-gain sweeps -> combined PLY stacks.

Capability parity with radar-pipeline processors/point_cloud.py:98-268 /
PointCloudWork/2_build_point_clouds.py: load one CSV per gain (auto format),
auto-stride to the per-gain cap, tint by gain, combine with and without
per-gain z offsets, stack-stride to the global cap, write
``frame_stack_v3.ply`` / ``frame_stack_flat_v3.ply``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import GainConfig, ProcessingConfig, RadarConfig
from ..core.containers import PointCloud
from ..core.loaders import detect_csv_format, load_cartesian_csv, load_radar_table
from ..core.writers import write_ply
from ..ops.geometry import sweep_to_points_simple
from ..ops.intensity import gain_constant_colors
from ..utils.timestamps import find_gain_sweeps

__all__ = ["load_points_from_csv", "apply_gain_colors", "combine_clouds",
           "build_stacked_clouds"]


def load_points_from_csv(
    path: Path,
    config: Optional[ProcessingConfig] = None,
    radar_config: Optional[RadarConfig] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Auto-detecting point loader: cartesian CSVs pass through; radar CSVs
    convert with uniform bins and row-index angles (the stack builder's
    convention, reference processors/point_cloud.py:48-95)."""
    if config is None:
        config = ProcessingConfig()
    if radar_config is None:
        radar_config = RadarConfig()

    if detect_csv_format(path) == "cartesian":
        cloud = load_cartesian_csv(path)
        return cloud.x, cloud.y, cloud.z

    table = load_radar_table(path, radar_config.num_echo_columns)
    intensities = table[:, 5:]
    angles = np.linspace(0.0, 2 * np.pi, table.shape[0], endpoint=False,
                         dtype=np.float32)
    return sweep_to_points_simple(
        angles, intensities,
        range_bin_width=radar_config.range_bin_width_m,
        range_start=radar_config.range_start_m,
        min_intensity=config.intensity_threshold,
        stride=config.point_stride)


def apply_gain_colors(z: np.ndarray, gain: int,
                      gain_config: Optional[GainConfig] = None) -> np.ndarray:
    if gain_config is None:
        gain_config = GainConfig()
    return gain_constant_colors(int(z.size), gain, gain_config.colors)


def combine_clouds(
    clouds: List[Tuple[int, PointCloud]],
    apply_offsets: bool = False,
    gain_config: Optional[GainConfig] = None,
) -> PointCloud:
    """Concatenate per-gain clouds, optionally applying the per-gain z
    offsets used for the separated stacked view."""
    if gain_config is None:
        gain_config = GainConfig()
    xs, ys, zs, cs = [], [], [], []
    for gain, cloud in clouds:
        xs.append(cloud.x)
        ys.append(cloud.y)
        offset = gain_config.z_offsets.get(gain, 0.0) if apply_offsets else 0.0
        zs.append(cloud.z + offset)
        cs.append(cloud.colors if cloud.colors is not None
                  else apply_gain_colors(cloud.z, gain, gain_config))
    return PointCloud(x=np.concatenate(xs), y=np.concatenate(ys),
                      z=np.concatenate(zs), colors=np.concatenate(cs))


def build_stacked_clouds(
    sweep_dir: Path,
    output_dir: Path,
    config: Optional[ProcessingConfig] = None,
    gain_config: Optional[GainConfig] = None,
    radar_config: Optional[RadarConfig] = None,
    generate_flat: bool = True,
    generate_offset: bool = True,
    name_prefix: str = "frame_stack",
    verbose: bool = True,
) -> Dict[str, Path]:
    """Build the offset and flat stacked PLYs from one CSV per gain."""
    if config is None:
        config = ProcessingConfig()
    if gain_config is None:
        gain_config = GainConfig()
    if radar_config is None:
        radar_config = RadarConfig()

    sweep_files = find_gain_sweeps(Path(sweep_dir))
    clouds: List[Tuple[int, PointCloud]] = []
    for gain, sweep_path in sweep_files.items():
        x, y, z = load_points_from_csv(sweep_path, config, radar_config)
        # auto-raise stride to stay under the per-gain point cap; note the
        # reference re-strides the already-strided load by at least
        # point_stride again (processors/point_cloud.py:226-234) — keep that
        gain_stride = max(config.point_stride,
                          int(np.ceil(x.size / config.max_points_per_gain)))
        if gain_stride > 1:
            x, y, z = x[::gain_stride], y[::gain_stride], z[::gain_stride]
        colors = apply_gain_colors(z, gain, gain_config)
        clouds.append((gain, PointCloud(x=x, y=y, z=z, colors=colors)))
        if verbose:
            print(f"gain {gain}: {x.size:,} points (stride={gain_stride})")

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    outputs: Dict[str, Path] = {}

    def _emit(name: str, cloud: PointCloud, path: Path) -> None:
        stack_stride = max(1, int(np.ceil(cloud.size / config.max_points_stack)))
        if stack_stride > 1:
            cloud = PointCloud(
                x=cloud.x[::stack_stride], y=cloud.y[::stack_stride],
                z=cloud.z[::stack_stride],
                colors=cloud.colors[::stack_stride]
                if cloud.colors is not None else None)
        write_ply(path, cloud)
        outputs[name] = path
        if verbose:
            print(f"{name} stack: {cloud.size:,} points -> {path.name}")

    if generate_offset:
        _emit("offset",
              combine_clouds(clouds, apply_offsets=True, gain_config=gain_config),
              output_dir / f"{name_prefix}_v3.ply")
    if generate_flat:
        _emit("flat",
              combine_clouds(clouds, apply_offsets=False, gain_config=gain_config),
              output_dir / f"{name_prefix}_flat_v3.ply")
    return outputs
