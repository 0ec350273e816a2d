"""Gain-fusion PLY builder: multi-gain frames to fused point clouds.

Capability parity with PointCloudWork/5_gain_fusion_ply_builder.py:473-677:
three modes — ``individual`` (one fused PLY per frame), ``stacked``
(temporal stack with z = frame index * spacing), ``comparison`` (per-gain +
fused PLYs for one frame).  Fusion (absolute concat or grid max-pool),
percentile normalization and the heat colormap all run on device.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..core.writers import write_ply_arrays
from ..ops import grid as grid_ops
from ..ops.intensity import (
    gain_constant_colors,
    gains_to_rgb,
    intensity_to_heat_rgb,
    normalize_intensity,
)
from ..utils.timestamps import discover_files, group_files_by_frame
from ..viz.plotting import HAS_MATPLOTLIB
from .ingest import FrameBatchLoader

__all__ = ["fuse_gains_absolute", "fuse_gains_max", "build_individual_frames",
           "build_stacked_sequence", "build_gain_comparison"]


def fuse_gains_absolute(frame_xyi: np.ndarray, frame_gain: np.ndarray,
                        count: int):
    """Absolute fusion = the ingested frame buffer itself (per-gain concat in
    ascending gain order).  Returns (x, y, intensity, gains)."""
    n = int(count)
    return (frame_xyi[:n, 0], frame_xyi[:n, 1], frame_xyi[:n, 2],
            frame_gain[:n])


def fuse_gains_max(
    frame_xyi: np.ndarray,
    count: int,
    grid_resolution: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grid max-pool fusion on device (cell centers with per-cell max
    intensity, reference :222-273)."""
    n = int(count)
    x, y, z = frame_xyi[:n, 0], frame_xyi[:n, 1], frame_xyi[:n, 2]
    if n == 0:
        return x, y, z
    x_min, y_min = float(x.min()), float(y.min())
    x_bins = int(np.ceil((float(x.max()) - x_min) / grid_resolution)) + 1
    y_bins = int(np.ceil((float(y.max()) - y_min) / grid_resolution)) + 1
    grid, _ = grid_ops.fuse_max_grid(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        jnp.ones((n,), bool), jnp.float32(x_min), jnp.float32(y_min),
        jnp.float32(grid_resolution), x_bins, y_bins)
    return grid_ops.max_grid_to_points(np.asarray(grid), x_min, y_min,
                                       grid_resolution)


def _normalize_and_color(intensity: np.ndarray, normalize: bool,
                         percentile: float):
    if normalize and intensity.size:
        z = np.asarray(normalize_intensity(jnp.asarray(intensity), None,
                                           percentile))
    else:
        z = intensity
    colors = np.asarray(intensity_to_heat_rgb(jnp.asarray(z)))
    return z, colors


def _prepare(data_dir, config, max_frames):
    cfg = config or PipelineConfig()
    files_by_gain = discover_files(Path(data_dir))
    if not files_by_gain:
        raise FileNotFoundError(f"No data files found in {data_dir}")
    frame_files = group_files_by_frame(files_by_gain,
                                       cfg.fusion.max_time_diff_ms)
    if max_frames > 0:
        frame_files = frame_files[:max_frames]
    loader = FrameBatchLoader(
        cfg, intensity_threshold=cfg.fusion.intensity_threshold,
        point_stride=cfg.fusion.point_stride, verbose=False)
    return cfg, frame_files, loader


def build_individual_frames(
    data_dir: Path,
    output_dir: Path,
    max_frames: int = 0,
    mode: str = "absolute",
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
) -> int:
    """One fused PLY per frame (+ preview PNG every 10 frames)."""
    cfg, frame_files, loader = _prepare(data_dir, config, max_frames)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    written = 0
    for i, ff in enumerate(frame_files):
        out = loader.convert_frame(loader.load_frame_tables(ff))
        if out is None:
            continue
        xyi, gain, count = (np.asarray(out[0]), np.asarray(out[1]), out[2])
        if mode == "max":
            x, y, intensity = fuse_gains_max(xyi, count,
                                             cfg.fusion.grid_resolution_m)
        else:
            x, y, intensity, _ = fuse_gains_absolute(xyi, gain, count)
        if x.size == 0:
            continue
        z, colors = _normalize_and_color(
            intensity, cfg.fusion.normalize_intensity,
            cfg.fusion.intensity_percentile)
        gain_str = "_".join(str(g) for g in sorted(ff))
        write_ply_arrays(output_dir / f"frame_{i:04d}_gains_{gain_str}.ply",
                         x, y, z, colors, precision=4)
        written += 1
        if HAS_MATPLOTLIB and i % 10 == 0:
            _scatter_png(x, y, colors,
                         output_dir / f"frame_{i:04d}_preview.png",
                         f"Frame {i} (Gains: {gain_str})")
        if verbose and (i + 1) % 50 == 0:
            print(f"  Processed {i + 1}/{len(frame_files)} frames")
    return written


def build_stacked_sequence(
    data_dir: Path,
    output_dir: Path,
    max_frames: int = 100,
    time_spacing: float = 10.0,
    mode: str = "absolute",
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
) -> Optional[Path]:
    """Single PLY with frames stacked along z = frame index * spacing."""
    cfg, frame_files, loader = _prepare(data_dir, config, max_frames)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    xs, ys, zs, cs = [], [], [], []
    for i, ff in enumerate(frame_files):
        out = loader.convert_frame(loader.load_frame_tables(ff))
        if out is None:
            continue
        xyi, gain, count = (np.asarray(out[0]), np.asarray(out[1]), out[2])
        if mode == "max":
            x, y, intensity = fuse_gains_max(xyi, count,
                                             cfg.fusion.grid_resolution_m)
        else:
            x, y, intensity, _ = fuse_gains_absolute(xyi, gain, count)
        if x.size == 0:
            continue
        zval, colors = _normalize_and_color(
            intensity, cfg.fusion.normalize_intensity,
            cfg.fusion.intensity_percentile)
        xs.append(x)
        ys.append(y)
        zs.append(np.full_like(x, i * time_spacing))
        cs.append(colors)
        if verbose and (i + 1) % 50 == 0:
            print(f"  Processed {i + 1}/{len(frame_files)} frames")

    if not xs:
        return None
    ply_path = output_dir / f"temporal_stack_{len(frame_files)}frames.ply"
    write_ply_arrays(ply_path, np.concatenate(xs), np.concatenate(ys),
                     np.concatenate(zs), np.concatenate(cs), precision=4)
    return ply_path


def build_gain_comparison(
    data_dir: Path,
    output_dir: Path,
    frame_idx: int = 0,
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
) -> Dict[str, Path]:
    """Per-gain PLYs + fused-by-gain + fused-by-intensity for one frame."""
    cfg, frame_files, loader = _prepare(data_dir, config, 0)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if frame_idx >= len(frame_files):
        raise IndexError(
            f"Frame {frame_idx} not found ({len(frame_files)} frames)")
    ff = frame_files[frame_idx]
    outputs: Dict[str, Path] = {}

    tables = loader.load_frame_tables(ff)
    for gain, table in tables:
        out = loader.convert_frame([(gain, table)])
        if out is None:
            continue
        xyi, _, count = (np.asarray(out[0]), out[1], int(out[2]))
        x, y, intensity = xyi[:count, 0], xyi[:count, 1], xyi[:count, 2]
        if x.size == 0:
            if verbose:
                print(f"  Gain {gain}: No points")
            continue
        z, _ = _normalize_and_color(intensity, cfg.fusion.normalize_intensity,
                                    cfg.fusion.intensity_percentile)
        colors = gain_constant_colors(x.size, gain, cfg.gains.colors)
        path = output_dir / f"frame_{frame_idx:04d}_gain_{gain}.ply"
        write_ply_arrays(path, x, y, z, colors, precision=4)
        outputs[f"gain_{gain}"] = path
        if HAS_MATPLOTLIB:
            _scatter_png(x, y, colors,
                         output_dir / f"frame_{frame_idx:04d}_gain_{gain}.png",
                         f"Frame {frame_idx} - Gain {gain}")
        if verbose:
            print(f"  Gain {gain}: {x.size:,} points")

    out = loader.convert_frame(tables)
    if out is not None:
        xyi, gain_arr, count = (np.asarray(out[0]), np.asarray(out[1]), out[2])
        x, y, intensity, gains = fuse_gains_absolute(xyi, gain_arr, count)
        if x.size:
            z, heat = _normalize_and_color(
                intensity, cfg.fusion.normalize_intensity,
                cfg.fusion.intensity_percentile)
            by_gain = gains_to_rgb(gains, cfg.gains.colors)
            p1 = output_dir / f"frame_{frame_idx:04d}_fused_by_gain.ply"
            write_ply_arrays(p1, x, y, z, by_gain, precision=4)
            outputs["fused_by_gain"] = p1
            p2 = output_dir / f"frame_{frame_idx:04d}_fused_by_intensity.ply"
            write_ply_arrays(p2, x, y, z, heat, precision=4)
            outputs["fused_by_intensity"] = p2
    return outputs


def _scatter_png(x, y, colors, path: Path, title: str,
                 max_points: int = 500_000) -> None:
    import matplotlib.pyplot as plt

    if len(x) > max_points:
        idx = np.random.default_rng(0).choice(len(x), max_points, replace=False)
        x, y, colors = x[idx], y[idx], colors[idx]
    fig, ax = plt.subplots(figsize=(12, 12))
    ax.scatter(x, y, c=colors.astype(np.float32) / 255.0, s=0.5, alpha=0.5)
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_title(title)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    plt.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
