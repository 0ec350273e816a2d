"""Data containers for radar sweeps, point clouds, frames, clusters and tracks.

Host-side containers mirror the reference data model
(radar-pipeline core/loaders.py:15-43 ``RadarSweep``/``PointCloud``;
PointCloudWork/4_temporal_object_tracker.py:97-159 ``RadarFrame``/``TrackedObject``/
``Cluster``).  Device-side batching uses ``FramePoints`` — fixed-capacity
arrays with validity masks so every shape is static under ``jax.jit``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "RadarSweep",
    "PointCloud",
    "RadarFrame",
    "Cluster",
    "TrackedObject",
    "FramePoints",
]


@dataclass
class RadarSweep:
    """One antenna rotation in polar form.

    ``intensities`` is the (num_angles, num_bins) echo matrix; ``ranges`` the
    per-angle range grid derived from the Scale column.
    """

    angles_rad: np.ndarray
    ranges: np.ndarray
    intensities: np.ndarray
    scale: np.ndarray
    gain: Optional[int] = None
    source_path: Optional[Path] = None

    @property
    def num_angles(self) -> int:
        return int(self.intensities.shape[0])

    @property
    def num_bins(self) -> int:
        return int(self.intensities.shape[1])


@dataclass
class PointCloud:
    """Flat 3D point cloud with optional per-point RGB colors (uint8)."""

    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    colors: Optional[np.ndarray] = None

    @property
    def size(self) -> int:
        return int(self.x.size)

    def to_coords(self) -> np.ndarray:
        """Return coordinates as an (N, 3) array."""
        return np.column_stack((self.x, self.y, self.z))

    @classmethod
    def from_coords(cls, coords: np.ndarray, colors: Optional[np.ndarray] = None) -> "PointCloud":
        return cls(x=coords[:, 0], y=coords[:, 1], z=coords[:, 2], colors=colors)


@dataclass
class RadarFrame:
    """A single time frame with fused multi-gain data.

    ``points`` is (N, 3) = x, y, intensity; ``gains`` records the source gain
    of each point (reference 4_temporal_object_tracker.py:97-108).
    """

    timestamp: Optional[datetime]
    timestamp_ms: int
    frame_id: int
    points: np.ndarray
    gains: np.ndarray

    @property
    def num_points(self) -> int:
        return int(self.points.shape[0])


@dataclass
class Cluster:
    """A cluster of points detected in a single frame
    (reference 4_temporal_object_tracker.py:143-159)."""

    cluster_id: int
    frame_id: int
    points: np.ndarray  # (N, 2) x, y
    intensities: np.ndarray  # (N,)
    centroid: np.ndarray  # (2,)

    @property
    def num_points(self) -> int:
        return int(self.points.shape[0])

    @property
    def mean_intensity(self) -> float:
        return float(np.mean(self.intensities)) if self.intensities.size else 0.0


@dataclass
class TrackedObject:
    """An object tracked across frames
    (reference 4_temporal_object_tracker.py:111-140)."""

    object_id: int
    object_type: str = "unknown"  # "buoy" | "boat" | "unknown"
    positions: List[np.ndarray] = field(default_factory=list)
    frames_seen: List[int] = field(default_factory=list)
    last_seen_frame: int = 0
    velocities: List[np.ndarray] = field(default_factory=list)
    color: Tuple[int, int, int] = (180, 180, 180)
    motion_history_frames: int = 5

    @property
    def centroid(self) -> np.ndarray:
        return self.positions[-1] if self.positions else np.array([0.0, 0.0])

    @property
    def average_velocity(self) -> float:
        if len(self.velocities) < 2:
            return 0.0
        recent = self.velocities[-self.motion_history_frames:]
        return float(np.mean([np.linalg.norm(v) for v in recent]))

    def predict_position(self, frames_ahead: int = 1) -> np.ndarray:
        if len(self.velocities) < 1:
            return self.centroid
        avg_vel = np.mean(self.velocities[-self.motion_history_frames:], axis=0)
        return self.centroid + avg_vel * frames_ahead


# ---------------------------------------------------------------------------
# Device-side batched containers (static shapes for jit)
# ---------------------------------------------------------------------------


@dataclass
class FramePoints:
    """Fixed-capacity compacted points for a batch of frames.

    ``xyi`` (F, C, 3) float32 — x, y, intensity; ``gain`` (F, C) int32;
    ``count`` (F,) int32 number of valid points per frame.  Entries beyond
    ``count`` are padding (coordinates set far outside the scene).
    """

    xyi: np.ndarray
    gain: np.ndarray
    count: np.ndarray
    frame_ids: np.ndarray  # (F,) int32 original frame ids

    @property
    def num_frames(self) -> int:
        return int(self.xyi.shape[0])

    @property
    def capacity(self) -> int:
        return int(self.xyi.shape[1])
