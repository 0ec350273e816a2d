"""CPU oracle: reference-semantics implementations in NumPy/sklearn/scipy.

This module re-derives (NOT copies) the reference algorithms'
behaviour — sequential ST-DBSCAN expansion, persistence land filtering,
Hungarian tracking — as a compact CPU implementation.  It serves two
purposes:

1. exact-match test oracle for the device kernels (tests/),
2. the measured CPU baseline that ``bench.py`` compares against (the
   reference publishes no numbers; see BASELINE.md).

Behavioural contracts being matched (file:line cites into /root/reference):
- conversion/threshold/stride: 4_temporal_object_tracker.py:203-232
- land filter: 4_temporal_object_tracker.py:359-436
- ST-DBSCAN: radar-pipeline processors/clustering.py:49-115 and the
  min_frames variant stdbscan_denoising_pipeline.py:264-369
- tracker: 4_temporal_object_tracker.py:543-688
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

__all__ = [
    "oracle_convert_sweep",
    "oracle_st_dbscan",
    "oracle_occupancy_grid",
    "oracle_land_mask",
    "oracle_filter_land",
    "oracle_fuse_max",
    "OracleTracker",
]


def oracle_convert_sweep(
    echo: np.ndarray,
    angles_rad: np.ndarray,
    scale: np.ndarray,
    threshold: float,
    stride: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference conversion semantics: per-angle range grid from Scale, mask
    echo > threshold, flatten row-major, stride."""
    num_bins = echo.shape[1]
    ranges = (scale[:, None].astype(np.float32) / num_bins) * np.arange(
        num_bins, dtype=np.float32)
    x = ranges * np.cos(angles_rad)[:, None]
    y = ranges * np.sin(angles_rad)[:, None]
    m = echo > threshold
    xf, yf, zf = x[m], y[m], echo[m]
    if stride > 1:
        xf, yf, zf = xf[::stride], yf[::stride], zf[::stride]
    return xf, yf, zf


def _radius_neighbors(coords: np.ndarray, eps: float) -> List[np.ndarray]:
    """All-pairs radius query; BallTree when available, brute force otherwise."""
    try:
        from sklearn.neighbors import BallTree

        tree = BallTree(coords)
        return list(tree.query_radius(coords, r=eps))
    except ImportError:  # pragma: no cover
        d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
        return [np.nonzero(row <= eps * eps)[0] for row in d2]


def oracle_st_dbscan(
    coords: np.ndarray,
    times: np.ndarray,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int = 1,
    border_mode: str = "always",
) -> np.ndarray:
    """Sequential ST-DBSCAN with the reference's visit-order label numbering.

    A point is core when it has >= min_samples spatio-temporal neighbors
    (self included) and, when min_frames > 1, those neighbors span at least
    min_frames distinct integer frames.  Noise stays -1.

    ``border_mode`` selects between the two reference variants, which differ
    in border-point handling:

    - "always" (package st_dbscan clustering.py:101-111 and the tracker
      4_temporal_object_tracker.py:495-504): every ST-neighbor of an expanded
      core gets the cluster label, even points already visited as noise —
      the seeds *set* re-enqueues them.
    - "if_earlier" (denoiser stdbscan_denoising_pipeline.py:343-366): the
      queue only admits unvisited points, so a border point scanned before
      its cluster was created stays noise.
    """
    n = coords.shape[0]
    labels = np.full(n, -1, dtype=np.int32)
    if n == 0:
        return labels
    visited = np.zeros(n, dtype=bool)
    spatial = _radius_neighbors(coords, eps_space)
    times = np.asarray(times, dtype=np.float32)
    times_int = times.astype(np.int64)

    def st_neigh(i: int) -> np.ndarray:
        nb = spatial[i]
        return nb[np.abs(times[nb] - times[i]) <= eps_time]

    def core(nb: np.ndarray) -> bool:
        if len(nb) < min_samples:
            return False
        if min_frames > 1 and len(np.unique(times_int[nb])) < min_frames:
            return False
        return True

    next_label = 0
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        nb = st_neigh(i)
        if not core(nb):
            continue
        labels[i] = next_label

        if border_mode == "always":
            seeds = set(int(k) for k in nb)
            while seeds:
                j = seeds.pop()
                if not visited[j]:
                    visited[j] = True
                    nb_j = st_neigh(j)
                    if core(nb_j):
                        seeds.update(int(k) for k in nb_j)
                        seeds.discard(j)
                if labels[j] == -1:
                    labels[j] = next_label
        else:  # "if_earlier"
            queue = list(nb)
            queued = np.zeros(n, dtype=bool)
            queued[nb] = True
            while queue:
                j = queue.pop(0)
                if not visited[j]:
                    visited[j] = True
                    nb_j = st_neigh(j)
                    if core(nb_j):
                        for k in nb_j:
                            if not visited[k] and not queued[k]:
                                queue.append(k)
                                queued[k] = True
                if labels[j] == -1:
                    labels[j] = next_label
        next_label += 1
    return labels


def oracle_occupancy_grid(
    frames_xy: List[np.ndarray],
    frames_intensity: List[np.ndarray],
    resolution: float,
) -> Tuple[np.ndarray, np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Per-cell occupancy counts + intensity sums over all frames
    (np.digitize binning semantics)."""
    all_x = np.concatenate([xy[:, 0] for xy in frames_xy])
    all_y = np.concatenate([xy[:, 1] for xy in frames_xy])
    x_edges = np.arange(all_x.min(), all_x.max() + resolution, resolution)
    y_edges = np.arange(all_y.min(), all_y.max() + resolution, resolution)
    nx, ny = len(x_edges) - 1, len(y_edges) - 1
    count = np.zeros((nx, ny), dtype=np.int32)
    isum = np.zeros((nx, ny), dtype=np.float64)
    for xy, inten in zip(frames_xy, frames_intensity):
        xi = np.clip(np.digitize(xy[:, 0], x_edges) - 1, 0, nx - 1)
        yi = np.clip(np.digitize(xy[:, 1], y_edges) - 1, 0, ny - 1)
        np.add.at(count, (xi, yi), 1)
        np.add.at(isum, (xi, yi), inten)
    return count, isum, (x_edges, y_edges)


def oracle_land_mask(
    count: np.ndarray,
    isum: np.ndarray,
    num_frames: int,
    persistence_threshold: float,
    min_intensity: float,
) -> np.ndarray:
    persistence = count / max(num_frames, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = np.where(count > 0, isum / count, 0)
    return (persistence >= persistence_threshold) & (avg >= min_intensity)


def oracle_filter_land(
    xy: np.ndarray,
    land_mask: np.ndarray,
    edges: Tuple[np.ndarray, np.ndarray],
) -> np.ndarray:
    """Boolean keep-mask for points whose grid cell is not land."""
    x_edges, y_edges = edges
    xi = np.clip(np.digitize(xy[:, 0], x_edges) - 1, 0, land_mask.shape[0] - 1)
    yi = np.clip(np.digitize(xy[:, 1], y_edges) - 1, 0, land_mask.shape[1] - 1)
    return ~land_mask[xi, yi]


def oracle_fuse_max(
    x: np.ndarray,
    y: np.ndarray,
    intensity: np.ndarray,
    grid_resolution: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grid max-pool fusion (5_gain_fusion_ply_builder.py:222-273): rasterize
    to cells, keep per-cell max intensity, emit occupied cell centers in the
    reference's (transposed where) output order."""
    x_min, y_min = x.min(), y.min()
    x_bins = int(np.ceil((x.max() - x_min) / grid_resolution)) + 1
    y_bins = int(np.ceil((y.max() - y_min) / grid_resolution)) + 1
    xi = ((x - x_min) / grid_resolution).astype(int)
    yi = ((y - y_min) / grid_resolution).astype(int)
    grid = np.zeros((x_bins, y_bins), dtype=np.float32)
    np.maximum.at(grid, (xi, yi), intensity)
    occ_y, occ_x = np.where(grid.T > 0)
    out_x = x_min + occ_x * grid_resolution + grid_resolution / 2
    out_y = y_min + occ_y * grid_resolution + grid_resolution / 2
    return out_x, out_y, grid[occ_x, occ_y]


# ---------------------------------------------------------------------------
# Tracker oracle
# ---------------------------------------------------------------------------


@dataclass
class _Track:
    oid: int
    otype: str = "unknown"
    positions: List[np.ndarray] = field(default_factory=list)
    frames_seen: List[int] = field(default_factory=list)
    last_seen: int = 0
    velocities: List[np.ndarray] = field(default_factory=list)


class OracleTracker:
    """Hungarian tracker with velocity prediction and buoy/boat
    classification, reproducing the reference's update order: associate ->
    gate -> update matched -> create unmatched -> cleanup."""

    def __init__(
        self,
        max_association_distance: float = 50.0,
        max_missed_frames: int = 10,
        stationary_velocity_threshold: float = 1.0,
        motion_history_frames: int = 5,
    ) -> None:
        self.tracks: Dict[int, _Track] = {}
        self.next_id = 1
        self.frame = 0
        self.max_dist = max_association_distance
        self.max_missed = max_missed_frames
        self.vel_thresh = stationary_velocity_threshold
        self.history = motion_history_frames

    # -- helpers ----------------------------------------------------------
    def _predict(self, tr: _Track, ahead: int) -> np.ndarray:
        pos = tr.positions[-1]
        if not tr.velocities:
            return pos
        return pos + np.mean(tr.velocities[-self.history:], axis=0) * ahead

    def _avg_speed(self, tr: _Track) -> float:
        if len(tr.velocities) < 2:
            return 0.0
        recent = tr.velocities[-self.history:]
        return float(np.mean([np.linalg.norm(v) for v in recent]))

    def _classify(self, tr: _Track) -> str:
        if len(tr.velocities) < self.history:
            return "unknown"
        return "buoy" if self._avg_speed(tr) < self.vel_thresh else "boat"

    def _spawn(self, centroid: np.ndarray, frame_id: int) -> None:
        tr = _Track(oid=self.next_id)
        tr.positions.append(centroid.copy())
        tr.frames_seen.append(frame_id)
        tr.last_seen = frame_id
        tr.velocities.append(np.zeros(2))
        self.tracks[self.next_id] = tr
        self.next_id += 1

    def _absorb(self, tr: _Track, centroid: np.ndarray, frame_id: int) -> None:
        elapsed = frame_id - tr.last_seen
        if elapsed > 0:
            tr.velocities.append((centroid - tr.positions[-1]) / elapsed)
        tr.positions.append(centroid.copy())
        tr.frames_seen.append(frame_id)
        tr.last_seen = frame_id
        tr.otype = self._classify(tr)

    def _cleanup(self) -> None:
        stale = [oid for oid, tr in self.tracks.items()
                 if self.frame - tr.last_seen > self.max_missed]
        for oid in stale:
            del self.tracks[oid]

    # -- public API -------------------------------------------------------
    def update(self, centroids: np.ndarray, frame_id: int) -> None:
        """Advance one frame with the given (C, 2) cluster centroids
        (ordered by ascending cluster label)."""
        from scipy.optimize import linear_sum_assignment

        self.frame = frame_id
        if centroids.shape[0] == 0:
            self._cleanup()
            return
        if not self.tracks:
            for c in centroids:
                self._spawn(c, frame_id)
            return

        active = [tr for tr in self.tracks.values()
                  if frame_id - tr.last_seen <= self.max_missed]
        if not active:
            for c in centroids:
                self._spawn(c, frame_id)
            self._cleanup()
            return

        cost = np.zeros((centroids.shape[0], len(active)))
        for i, c in enumerate(centroids):
            for j, tr in enumerate(active):
                pred = self._predict(tr, frame_id - tr.last_seen)
                cost[i, j] = np.linalg.norm(c - pred)

        rows, cols = linear_sum_assignment(cost)
        matched = set()
        for i, j in zip(rows, cols):
            if cost[i, j] <= self.max_dist:
                self._absorb(active[j], centroids[i], frame_id)
                matched.add(i)
        for i, c in enumerate(centroids):
            if i not in matched:
                self._spawn(c, frame_id)
        self._cleanup()

    def summary(self) -> List[dict]:
        """Rows of tracked_objects.csv for the surviving objects."""
        rows = []
        for tr in self.tracks.values():
            rows.append({
                "object_id": tr.oid,
                "object_type": tr.otype,
                "num_frames_seen": len(tr.frames_seen),
                "first_frame": min(tr.frames_seen) if tr.frames_seen else -1,
                "last_frame": max(tr.frames_seen) if tr.frames_seen else -1,
                "avg_velocity": self._avg_speed(tr),
                "final_x": tr.positions[-1][0],
                "final_y": tr.positions[-1][1],
            })
        return rows

    def trajectories(self) -> List[dict]:
        rows = []
        for tr in self.tracks.values():
            for pos, fid in zip(tr.positions, tr.frames_seen):
                rows.append({
                    "object_id": tr.oid,
                    "object_type": tr.otype,
                    "frame_id": fid,
                    "x": pos[0],
                    "y": pos[1],
                })
        return rows
