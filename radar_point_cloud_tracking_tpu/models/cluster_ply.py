"""PLY clustering driver: load -> subsample -> color-time inference ->
device ST-DBSCAN -> labels CSV.

Capability parity with radar-pipeline processors/clustering.py:118-208.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..config import ClusteringConfig, GainConfig
from ..core.containers import PointCloud
from ..core.loaders import load_ply
from ..core.writers import write_labels_csv
from ..ops.colors import infer_time_from_colors
from ..ops.stdbscan import st_dbscan

__all__ = ["subsample_cloud", "cluster_point_cloud", "process_ply_clustering"]


def subsample_cloud(cloud: PointCloud, max_points: int,
                    seed: Optional[int] = 0) -> Tuple[PointCloud, int]:
    """Random subsample to at most ``max_points``.

    Unlike the reference's unseeded ``np.random.choice``
    (core/transforms.py:158), this is seeded and therefore reproducible
    (documented divergence; pass ``seed=None`` for nondeterminism).
    """
    n = cloud.size
    if n <= max_points:
        return cloud, 1
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, max_points, replace=False)
    stride = int(np.ceil(n / max_points))
    return PointCloud(
        x=cloud.x[idx], y=cloud.y[idx], z=cloud.z[idx],
        colors=cloud.colors[idx] if cloud.colors is not None else None,
    ), stride


def cluster_point_cloud(
    cloud: PointCloud,
    config: Optional[ClusteringConfig] = None,
    gain_config: Optional[GainConfig] = None,
) -> np.ndarray:
    """ST-DBSCAN over the 3D coords with per-point times inferred from the
    gain color tints (reference processors/clustering.py:118-154)."""
    if config is None:
        config = ClusteringConfig()
    if gain_config is None:
        gain_config = GainConfig()
    coords = cloud.to_coords()
    times = infer_time_from_colors(cloud.colors, gain_config.colors)
    return st_dbscan(coords, times, config.eps_space, config.eps_time,
                     config.min_samples, config=config)


def process_ply_clustering(
    ply_path: Path,
    output_dir: Optional[Path] = None,
    config: Optional[ClusteringConfig] = None,
    gain_config: Optional[GainConfig] = None,
    verbose: bool = True,
) -> Tuple[Path, np.ndarray]:
    """Load a PLY, cluster it and write ``<stem>_dbscan_labels.csv``."""
    if config is None:
        config = ClusteringConfig()
    if gain_config is None:
        gain_config = GainConfig()
    ply_path = Path(ply_path)
    if output_dir is None:
        output_dir = ply_path.parent

    cloud = load_ply(ply_path)
    cloud, stride = subsample_cloud(cloud, config.max_points)
    if verbose:
        print(f"{ply_path.name}: using {cloud.size:,} points "
              f"(approx stride={stride})")

    labels = cluster_point_cloud(cloud, config, gain_config)

    unique, counts = np.unique(labels, return_counts=True)
    if verbose:
        summary = dict(zip(unique.tolist(), counts.tolist()))
        print(f"{ply_path.name}: labels summary {summary}")

    csv_path = Path(output_dir) / f"{ply_path.stem}_dbscan_labels.csv"
    write_labels_csv(csv_path, cloud.to_coords(), labels)
    if verbose:
        print(f"Labels CSV -> {csv_path.name}")
    return csv_path, labels
