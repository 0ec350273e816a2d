"""Generic point-cloud plotting (PLY previews, labeled clusters).

Capability parity with the reference visualization layer
(radar-pipeline visualization/plotting.py:27-243): 3D scatter previews,
label-colored cluster plots with deterministic per-label colors, PLY->PNG
driver.  All figures render on the Agg backend.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAS_MATPLOTLIB = True
except ModuleNotFoundError:  # pragma: no cover
    HAS_MATPLOTLIB = False

from ..core.containers import PointCloud

__all__ = [
    "HAS_MATPLOTLIB",
    "check_matplotlib",
    "labels_to_colors",
    "plot_point_cloud",
    "plot_labeled_cloud",
    "plot_ply_preview",
]


def check_matplotlib() -> None:
    if not HAS_MATPLOTLIB:
        raise RuntimeError(
            "matplotlib is required for plotting but is not installed.")


def labels_to_colors(
    labels: np.ndarray,
    original_colors: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Noise -> gray 120; clusters take their first point's original color or
    a deterministic per-label random color (reference plotting.py:27-59)."""
    labels = np.asarray(labels)
    unique = np.unique(labels)
    lut = {}
    for lbl in unique:
        if lbl == -1:
            lut[lbl] = np.array([120, 120, 120], dtype=np.uint8)
        elif original_colors is not None and (labels == lbl).any():
            lut[lbl] = original_colors[labels == lbl][0]
        else:
            rng = np.random.RandomState(int(lbl))
            lut[lbl] = rng.randint(0, 255, 3).astype(np.uint8)
    return np.vstack([lut[l] for l in labels]).astype(np.uint8)


def plot_point_cloud(
    path: Path,
    cloud: PointCloud,
    title: str = "Point Cloud",
    max_points: int = 1_000_000,
    alpha: float = 0.5,
    marker_size: float = 1.0,
    dpi: int = 200,
) -> None:
    """3D scatter preview with stride subsampling above ``max_points``."""
    check_matplotlib()
    x, y, z, colors = cloud.x, cloud.y, cloud.z, cloud.colors
    stride = max(1, int(np.ceil(x.size / max_points)))
    if stride > 1:
        x, y, z = x[::stride], y[::stride], z[::stride]
        colors = colors[::stride] if colors is not None else None

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    c = colors.astype(np.float32) / 255.0 if colors is not None else None
    ax.scatter(x, y, z, c=c, s=marker_size, alpha=alpha)
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_zlabel("Z / Intensity")
    ax.set_title(title)
    plt.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi)
    plt.close(fig)


def plot_labeled_cloud(
    path: Path,
    coords: np.ndarray,
    labels: np.ndarray,
    original_colors: Optional[np.ndarray] = None,
    title: str = "Clustered Point Cloud",
    max_points: int = 1_000_000,
    alpha: float = 0.5,
    marker_size: float = 0.5,
    dpi: int = 200,
) -> None:
    check_matplotlib()
    stride = max(1, int(np.ceil(coords.shape[0] / max_points)))
    if stride > 1:
        coords = coords[::stride]
        labels = labels[::stride]
        if original_colors is not None:
            original_colors = original_colors[::stride]

    colors = labels_to_colors(labels, original_colors).astype(np.float32) / 255.0
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2], c=colors,
               s=marker_size, alpha=alpha)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    ax.set_title(title)
    plt.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi)
    plt.close(fig)


def plot_ply_preview(
    ply_path: Path,
    output_path: Optional[Path] = None,
    max_points: int = 1_000_000,
    alpha: float = 0.5,
) -> Path:
    """Load a PLY and save a PNG preview next to it."""
    from ..core.loaders import load_ply

    ply_path = Path(ply_path)
    if output_path is None:
        output_path = ply_path.with_suffix(".png")
    cloud = load_ply(ply_path)
    plot_point_cloud(output_path, cloud, title=ply_path.name,
                     max_points=max_points, alpha=alpha)
    return Path(output_path)
