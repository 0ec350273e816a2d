"""Writers for PLY point clouds and CSV artifacts.

Format-compatible with the reference outputs: ASCII PLY header per
radar-pipeline core/writers.py:29-40, binary-little-endian PLY per
PointCloudWorkF/stdbscan_denoising_pipeline.py:797-827, labels CSV per
core/writers.py:65-81.  ASCII encoding runs through the native C++ formatter
when available.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .. import native
from .containers import PointCloud

__all__ = [
    "ply_header",
    "write_ply",
    "write_ply_arrays",
    "write_cartesian_csv",
    "write_labels_csv",
]


def ply_header(num_points: int, binary: bool = False) -> str:
    fmt = "binary_little_endian 1.0" if binary else "ascii 1.0"
    return (
        "ply\n"
        f"format {fmt}\n"
        f"element vertex {num_points}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        "property uchar red\n"
        "property uchar green\n"
        "property uchar blue\n"
        "end_header\n"
    )


def write_ply_arrays(
    path: Path,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    colors: Optional[np.ndarray] = None,
    use_binary: bool = False,
    precision: int = 6,
) -> None:
    """Write x/y/z (+RGB) arrays as a PLY file.

    ``use_binary=True`` emits the little-endian packed layout (~10x faster
    writes for large clouds); otherwise ASCII with ``precision`` decimals.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    num_points = int(np.asarray(x).size)
    if colors is None:
        colors = np.full((num_points, 3), 180, dtype=np.uint8)
    colors = np.ascontiguousarray(colors, dtype=np.uint8)
    header = ply_header(num_points, binary=use_binary)

    if use_binary:
        dtype = np.dtype([
            ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
            ("r", "u1"), ("g", "u1"), ("b", "u1"),
        ])
        rec = np.empty(num_points, dtype=dtype)
        rec["x"] = np.asarray(x, dtype=np.float32)
        rec["y"] = np.asarray(y, dtype=np.float32)
        rec["z"] = np.asarray(z, dtype=np.float32)
        rec["r"] = colors[:, 0]
        rec["g"] = colors[:, 1]
        rec["b"] = colors[:, 2]
        with path.open("wb") as fh:
            fh.write(header.encode("ascii"))
            rec.tofile(fh)
        return

    if native.HAVE_NATIVE:
        native.write_ply_ascii(path, header,
                               np.asarray(x, dtype=np.float32),
                               np.asarray(y, dtype=np.float32),
                               np.asarray(z, dtype=np.float32),
                               colors, precision)
        return

    data = np.column_stack([
        np.asarray(x, dtype=np.float32),
        np.asarray(y, dtype=np.float32),
        np.asarray(z, dtype=np.float32),
        colors.astype(np.float32),
    ])
    fmt = " ".join([f"%.{precision}f"] * 3 + ["%d"] * 3)
    with path.open("w", encoding="utf-8") as fh:
        fh.write(header)
        np.savetxt(fh, data, fmt=fmt)


def write_ply(path: Path, cloud: PointCloud, use_binary: bool = False,
              precision: int = 6) -> None:
    """Write a :class:`PointCloud` to PLY (gray 180 when colors missing,
    reference core/writers.py:26-27)."""
    write_ply_arrays(path, cloud.x, cloud.y, cloud.z, cloud.colors,
                     use_binary=use_binary, precision=precision)


def write_cartesian_csv(path: Path, cloud: PointCloud) -> None:
    """Write x,y,z CSV (reference core/writers.py:49-62)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = np.column_stack([cloud.x, cloud.y, cloud.z])
    with path.open("w", encoding="utf-8", newline="\n") as fh:
        fh.write("x,y,z\n")
        np.savetxt(fh, data, fmt="%g,%g,%g")


def write_labels_csv(path: Path, coords: np.ndarray, labels: np.ndarray) -> None:
    """Write x,y,z,label CSV with 6-decimal coordinates
    (reference core/writers.py:65-81)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.column_stack((coords, labels))
    np.savetxt(path, arr, fmt="%.6f,%.6f,%.6f,%d", header="x,y,z,label",
               comments="")
