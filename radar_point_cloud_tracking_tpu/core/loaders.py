"""Loaders for radar sweep CSVs, Cartesian CSVs and PLY point clouds.

API parity with the reference package (radar-pipeline core/loaders.py:46-269),
but the hot paths run through the native C++ codec (native/radar_native.cpp)
instead of pandas, and PLY loading handles both ASCII and binary-little-endian
formats (the reference writes binary PLYs in
PointCloudWorkF/stdbscan_denoising_pipeline.py:767-855).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Literal, Optional, Tuple

import numpy as np

from .. import native
from ..config import RadarConfig
from .containers import PointCloud, RadarSweep

__all__ = [
    "load_radar_csv",
    "load_radar_sweep_simple",
    "load_cartesian_csv",
    "load_ply",
    "detect_csv_format",
    "load_points_auto",
    "load_radar_table",
]

_META_COLS = 5  # Status, Scale, Range, Gain, Angle


def load_radar_table(path: Path, num_echo_columns: int = 1024) -> np.ndarray:
    """Load the raw numeric table of a radar CSV (rows x (5 + num_echo)).

    Missing/NaN fields become 0, matching pandas ``fillna(0)`` in the
    reference loader (radar-pipeline core/loaders.py:80).
    """
    ncols = _META_COLS + num_echo_columns
    if native.HAVE_NATIVE:
        return native.parse_numeric_csv(path, ncols, skip_rows=1)
    # NumPy fallback
    data = np.genfromtxt(path, delimiter=",", skip_header=1,
                         dtype=np.float32, filling_values=0.0)
    if data.size == 0:
        return np.empty((0, ncols), dtype=np.float32)
    data = np.atleast_2d(data)
    if data.shape[1] < ncols:  # pad missing trailing columns with zeros
        pad = np.zeros((data.shape[0], ncols - data.shape[1]), dtype=np.float32)
        data = np.concatenate([data, pad], axis=1)
    return np.nan_to_num(data[:, :ncols], copy=False)


def load_radar_csv(
    path: Path,
    config: Optional[RadarConfig] = None,
) -> RadarSweep:
    """Load a radar sweep CSV into a :class:`RadarSweep`.

    Angle units convert as ``deg2rad(angle * 360/8196)``; per-angle range
    grids are ``(Scale / num_bins) * bin_index`` (reference
    core/loaders.py:77-85).
    """
    if config is None:
        config = RadarConfig()

    data = load_radar_table(path, config.num_echo_columns)
    if data.shape[0] == 0:
        raise ValueError(f"CSV is empty: {path}")

    angles_rad = np.deg2rad(data[:, 4] * np.float32(config.angle_scale)).astype(np.float32)
    echo_data = data[:, _META_COLS:]
    max_ranges = data[:, 1]
    num_bins = echo_data.shape[1]
    ranges = (max_ranges[:, None] / num_bins) * np.arange(num_bins, dtype=np.float32)

    gains = np.unique(data[:, 3])
    gain = int(gains[0]) if len(gains) == 1 else None

    return RadarSweep(
        angles_rad=angles_rad,
        ranges=ranges.astype(np.float32),
        intensities=echo_data,
        scale=max_ranges,
        gain=gain,
        source_path=Path(path),
    )


def load_radar_sweep_simple(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Load a sweep with uniform row-index angles (reference
    core/loaders.py:104-122): ignores the Angle column and assigns
    ``linspace(0, 2*pi)`` by row order."""
    data = load_radar_table(path)
    intensities = data[:, _META_COLS:]
    num_angles = data.shape[0]
    angles_rad = np.linspace(0.0, 2 * np.pi, num_angles, endpoint=False,
                             dtype=np.float32)
    return angles_rad, intensities


def load_cartesian_csv(path: Path) -> PointCloud:
    """Load an x,y,z CSV with case-insensitive header mapping
    (reference core/loaders.py:125-146)."""
    with Path(path).open("r", encoding="utf-8") as fh:
        header = fh.readline().strip().split(",")
    col_map = {c.strip().lower(): i for i, c in enumerate(header)}
    xi = col_map.get("x", 0)
    yi = col_map.get("y", 1)
    zi = col_map.get("z", 2)

    data = np.loadtxt(path, delimiter=",", skiprows=1, dtype=np.float32, ndmin=2)
    return PointCloud(x=data[:, xi], y=data[:, yi], z=data[:, zi])


def _parse_ply_header(raw: bytes, path: Path):
    """Parse a PLY header; returns (fmt, num_vertices, prop_names, prop_types,
    body_offset)."""
    header_end = raw.find(b"end_header")
    if header_end < 0:
        raise ValueError(f"Could not parse header for {path}")
    nl = raw.find(b"\n", header_end)
    body_offset = nl + 1 if nl >= 0 else len(raw)
    header_text = raw[:header_end].decode("ascii", errors="replace")
    lines = [ln.strip() for ln in header_text.splitlines()]
    if not lines or not lines[0].startswith("ply"):
        raise ValueError(f"{path} is not a PLY file")

    fmt = "ascii"
    num_vertices = None
    prop_names: List[str] = []
    prop_types: List[str] = []
    for line in lines:
        if line.startswith("format"):
            parts = line.split()
            if len(parts) >= 2:
                fmt = parts[1]
        elif line.startswith("element vertex"):
            num_vertices = int(line.split()[-1])
        elif line.startswith("property"):
            parts = line.split()
            prop_types.append(parts[1])
            prop_names.append(parts[-1])
    if num_vertices is None:
        raise ValueError(f"Could not parse header for {path}")
    return fmt, num_vertices, prop_names, prop_types, body_offset


_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
}


def load_ply(path: Path) -> PointCloud:
    """Load an ASCII or binary-little-endian PLY point cloud.

    Clouds without color properties get the default gray 180 used by the
    reference (core/loaders.py:216-218).
    """
    path = Path(path)
    with path.open("rb") as fh:
        head = fh.read(65536)
    fmt, num_vertices, prop_names, prop_types, body_offset = _parse_ply_header(head, path)
    prop_idx = {name: i for i, name in enumerate(prop_names)}
    if not {"x", "y", "z"} <= prop_idx.keys():
        raise ValueError(f"PLY missing x/y/z properties: {path}")

    if fmt == "ascii":
        ncols = len(prop_names)
        if native.HAVE_NATIVE:
            data = native.parse_ascii_rows(path, body_offset, num_vertices, ncols)
        else:
            with path.open("rb") as fh:
                fh.seek(body_offset)
                body = fh.read().decode("ascii")
            data = np.fromiter((float(t) for t in body.split()), dtype=np.float32)
            data = data[: num_vertices * ncols].reshape(-1, ncols)
        if data.shape[0] < num_vertices:
            raise ValueError(
                f"Expected {num_vertices} vertices, found {data.shape[0]}")
        cols = {name: data[:, i] for name, i in prop_idx.items()}
        x = cols["x"].astype(np.float32)
        y = cols["y"].astype(np.float32)
        z = cols["z"].astype(np.float32)
        if {"red", "green", "blue"} <= prop_idx.keys():
            colors = np.stack(
                [cols["red"], cols["green"], cols["blue"]], axis=1
            ).astype(np.uint8)
        else:
            colors = np.full((num_vertices, 3), 180, dtype=np.uint8)
        return PointCloud(x=x, y=y, z=z, colors=colors)

    if fmt == "binary_little_endian":
        dtype = np.dtype([(n, _PLY_DTYPES[t]) for n, t in zip(prop_names, prop_types)])
        rec = np.fromfile(path, dtype=dtype, count=num_vertices, offset=body_offset)
        if rec.shape[0] < num_vertices:
            raise ValueError(
                f"Expected {num_vertices} vertices, found {rec.shape[0]}")
        x = rec["x"].astype(np.float32)
        y = rec["y"].astype(np.float32)
        z = rec["z"].astype(np.float32)
        if {"red", "green", "blue"} <= prop_idx.keys():
            colors = np.stack(
                [rec["red"], rec["green"], rec["blue"]], axis=1
            ).astype(np.uint8)
        else:
            colors = np.full((num_vertices, 3), 180, dtype=np.uint8)
        return PointCloud(x=x, y=y, z=z, colors=colors)

    raise ValueError(f"Unsupported PLY format '{fmt}' in {path}")


def detect_csv_format(path: Path) -> Literal["radar", "cartesian"]:
    """Detect radar-sweep vs Cartesian x,y,z CSV (reference
    core/loaders.py:223-243): an x/y/z header or 3 named columns means
    cartesian."""
    with Path(path).open("r", encoding="utf-8") as fh:
        header = fh.readline().strip().split(",")
    lower_cols = [c.strip().lower() for c in header]
    has_xyz_header = {"x", "y", "z"} <= set(lower_cols)
    if has_xyz_header or (len(lower_cols) == 3 and lower_cols[0] != "0"):
        return "cartesian"
    return "radar"


def load_points_auto(path: Path, config: Optional[RadarConfig] = None) -> PointCloud:
    """Auto-detect CSV format and load as a point cloud."""
    from ..ops.geometry import sweep_to_point_cloud_host

    fmt = detect_csv_format(path)
    if fmt == "cartesian":
        return load_cartesian_csv(path)
    sweep = load_radar_csv(path, config)
    return sweep_to_point_cloud_host(sweep)
