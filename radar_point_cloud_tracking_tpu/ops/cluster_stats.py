"""Per-frame cluster statistics from global ST-DBSCAN labels.

The reference slices global labels back into per-frame ``Cluster`` objects
with Python loops over ``set(frame_labels)`` (4_temporal_object_tracker.py:
509-536).  Here it is one segment-scatter program: key = (local frame index,
global label) -> counts / coordinate sums / intensity sums, then a per-frame
ascending-label compaction into fixed (F, MAXC) tracker inputs.

Clusters are emitted in ascending-global-label order within each frame; the
reference iterates ``set(frame_labels)`` whose order can deviate from
ascending on hash collisions — this is an intentional canonicalization (the
CPU oracle encodes the same convention).

Capacity overflow is *reported*, never silent: ``present_count`` carries the
true per-frame cluster count before truncation to ``max_clusters``, and
``label_overflow`` counts points whose label fell outside ``label_cap``.
Callers (models/tracker.py) grow the capacities and retry when either
fires, so a saturated table can never silently drop objects.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ClusterStats", "per_frame_cluster_stats"]


class ClusterStats(NamedTuple):
    centroids: jnp.ndarray  # (F, M, 2) f32
    valid: jnp.ndarray  # (F, M) bool
    label: jnp.ndarray  # (F, M) int32 global label per compacted slot
    num_points: jnp.ndarray  # (F, M) int32
    mean_intensity: jnp.ndarray  # (F, M) f32
    present_count: jnp.ndarray  # (F,) int32 true per-frame cluster count
    label_overflow: jnp.ndarray  # () int32 points with label >= label_cap


@functools.partial(jax.jit, static_argnames=("num_frames", "label_cap",
                                             "max_clusters"))
def per_frame_cluster_stats(
    xy: jnp.ndarray,  # (N, 2)
    intensity: jnp.ndarray,  # (N,)
    frame_idx: jnp.ndarray,  # (N,) int32 local frame index
    labels: jnp.ndarray,  # (N,) int32 global cluster labels (-1 noise)
    valid: jnp.ndarray,  # (N,) bool
    num_frames: int,
    label_cap: int,
    max_clusters: int,
) -> ClusterStats:
    """Per-frame compacted cluster table (see ``ClusterStats``), clusters
    ordered by ascending global label within each frame."""
    n = xy.shape[0]
    f, l, m = num_frames, label_cap, max_clusters

    use = valid & (labels >= 0) & (labels < l)
    overflow = jnp.sum(valid & (labels >= l)).astype(jnp.int32)
    key = jnp.where(use, frame_idx * l + labels, f * l)
    size = f * l + 1

    count = jnp.zeros((size,), jnp.int32).at[key].add(
        use.astype(jnp.int32), mode="drop")
    sx = jnp.zeros((size,), jnp.float32).at[key].add(
        jnp.where(use, xy[:, 0], 0.0), mode="drop")
    sy = jnp.zeros((size,), jnp.float32).at[key].add(
        jnp.where(use, xy[:, 1], 0.0), mode="drop")
    si = jnp.zeros((size,), jnp.float32).at[key].add(
        jnp.where(use, intensity, 0.0), mode="drop")

    count = count[:-1].reshape(f, l)
    sx = sx[:-1].reshape(f, l)
    sy = sy[:-1].reshape(f, l)
    si = si[:-1].reshape(f, l)

    present = count > 0
    present_count = jnp.sum(present, axis=1).astype(jnp.int32)
    # ascending-label compaction: argsort puts present labels first in label
    # order (stable sort over ~present)
    order = jnp.argsort(~present, axis=1, stable=True)[:, :m]  # (F, M)
    take = jnp.take_along_axis
    cvalid = take(present, order, axis=1)
    cnum = take(count, order, axis=1)
    csx = take(sx, order, axis=1)
    csy = take(sy, order, axis=1)
    csi = take(si, order, axis=1)
    denom = jnp.maximum(cnum, 1).astype(jnp.float32)
    centroids = jnp.stack([csx / denom, csy / denom], axis=-1)
    mean_int = csi / denom
    return ClusterStats(centroids, cvalid, order.astype(jnp.int32), cnum,
                        mean_int, present_count, overflow)
