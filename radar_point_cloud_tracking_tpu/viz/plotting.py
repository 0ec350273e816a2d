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

_NOISE_RGB = np.array([120, 120, 120], dtype=np.uint8)


def check_matplotlib() -> None:
    if not HAS_MATPLOTLIB:
        raise RuntimeError(
            "matplotlib is required for plotting but is not installed.")


def labels_to_colors(
    labels: np.ndarray,
    original_colors: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-point RGB for a labeling: noise (-1) renders mid-gray; a real
    cluster takes its first member's original color when colors are supplied,
    otherwise an RGB triple seeded deterministically from the label id so
    replotting the same labeling yields the same palette."""
    labels = np.asarray(labels)
    uniq, first_idx, inverse = np.unique(
        labels, return_index=True, return_inverse=True)

    palette = np.empty((uniq.size, 3), dtype=np.uint8)
    for k, lbl in enumerate(uniq):
        if lbl == -1:
            palette[k] = _NOISE_RGB
        elif original_colors is not None:
            palette[k] = original_colors[first_idx[k]]
        else:
            palette[k] = np.random.RandomState(int(lbl)).randint(0, 255, 3)
    return palette[inverse.reshape(labels.shape)]


def _stride_for(n_points: int, max_points: int) -> int:
    return max(1, int(np.ceil(n_points / max_points)))


def _render_scatter3d(
    path: Path,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    rgb01: Optional[np.ndarray],
    title: str,
    axis_labels: tuple,
    marker_size: float,
    alpha: float,
    dpi: int,
) -> None:
    """Render one 3D scatter to a PNG (Agg), creating parent dirs."""
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(x, y, z, c=rgb01, s=marker_size, alpha=alpha)
    for setter, text in zip(
            (ax.set_xlabel, ax.set_ylabel, ax.set_zlabel), axis_labels):
        setter(text)
    ax.set_title(title)
    plt.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi)
    plt.close(fig)


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
    stride = _stride_for(cloud.x.size, max_points)
    x, y, z = (a[::stride] for a in (cloud.x, cloud.y, cloud.z))
    rgb01 = None
    if cloud.colors is not None:
        rgb01 = cloud.colors[::stride].astype(np.float32) / 255.0
    _render_scatter3d(path, x, y, z, rgb01, title,
                      ("X (m)", "Y (m)", "Z / Intensity"),
                      marker_size, alpha, dpi)


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
    stride = _stride_for(coords.shape[0], max_points)
    coords, labels = coords[::stride], labels[::stride]
    if original_colors is not None:
        original_colors = original_colors[::stride]

    rgb01 = labels_to_colors(labels, original_colors).astype(np.float32) / 255.0
    _render_scatter3d(path, coords[:, 0], coords[:, 1], coords[:, 2], rgb01,
                      title, ("X", "Y", "Z"), marker_size, alpha, dpi)


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
