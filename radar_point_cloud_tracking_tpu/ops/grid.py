"""Device grid ops: persistence occupancy grids, land masking, max-pool
multi-gain fusion.

The reference builds these with ``np.digitize`` + ``np.add.at`` /
``np.maximum.at`` host loops (4_temporal_object_tracker.py:359-436,
5_gain_fusion_ply_builder.py:222-273).  Here each becomes one fused XLA
scatter program over the whole padded point batch; per-frame loops become a
segment dimension.  Bin edges are computed host-side with ``np.arange`` so
float semantics match ``np.digitize`` bit-for-bit, and lookups use
``searchsorted`` on those exact edges.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_edges",
    "digitize_clip",
    "occupancy_grid",
    "land_mask_from_grids",
    "land_keep_mask",
    "land_filter_keep",
    "fuse_max_grid",
]


def make_edges(vmin: float, vmax: float, resolution: float) -> np.ndarray:
    """Bin edges with np.arange accumulation semantics
    (4_temporal_object_tracker.py:372-373)."""
    return np.arange(vmin, vmax + resolution, resolution)


def edges_hilo(edges: np.ndarray) -> np.ndarray:
    """Split float64 bin edges into a (2, E) float32 [hi, lo] pair for the
    exact device digitize (see :func:`digitize_clip`).

    ``hi`` is the f32 rounding of each edge, ``lo = f32(edge - hi)``.  The
    residual is exact in sign and far below the gap between adjacent f32
    values at these magnitudes, which is all the comparison below needs.
    """
    e64 = np.asarray(edges, np.float64)
    hi = e64.astype(np.float32)
    lo = (e64 - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo])


def digitize_clip(values: jnp.ndarray, edges: jnp.ndarray,
                  n_cells: int) -> jnp.ndarray:
    """``clip(digitize(v, edges) - 1, 0, n_cells - 1)`` on device.

    np.digitize(v, edges) (increasing edges) == searchsorted(edges, v,
    side='right').  method='sort' (one co-sort of values+edges) measured
    4.4x faster than the default binary-search scan on TPU at 10M points,
    with identical indices.

    With a 1D f32 ``edges`` array the comparison happens against the
    rounded edges (may differ from the host's float64 np.digitize for
    points within f32 rounding of an edge).  Pass the (2, E) [hi, lo]
    output of :func:`edges_hilo` for BIT-EXACT float64-edge semantics:
    a v (f32, hence exact in f64) differing from an edge's hi is decided
    by hi alone (distinct f32s differ by >= 1 ulp while |lo| <= 0.5 ulp),
    and a tie hi == v is decided by the sign of lo (the residual's sign is
    preserved exactly by the f32 rounding).  At most one edge can tie any
    v because the edges are a full resolution step apart.
    """
    if edges.ndim == 2:
        hi, lo = edges[0], edges[1]
        idx = jnp.searchsorted(hi, values, side="right", method="sort")
        prev = jnp.clip(idx - 1, 0, hi.shape[0] - 1)
        # counted edge with hi == v whose true f64 value exceeds v (lo > 0)
        # must be uncounted to reproduce np.digitize on the f64 edges
        over = (idx >= 1) & (hi[prev] == values) & (lo[prev] > 0)
        idx = idx - over.astype(idx.dtype)
    else:
        idx = jnp.searchsorted(edges, values, side="right", method="sort")
    return jnp.clip(idx - 1, 0, n_cells - 1)


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def occupancy_grid(
    xy: jnp.ndarray,  # (N, 2) padded points (all frames flattened)
    intensity: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    frame_occurrence_weight: jnp.ndarray,  # (N,) float: 1.0 per valid point
    x_edges: jnp.ndarray,
    y_edges: jnp.ndarray,
    nx: int,
    ny: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter per-point counts and intensity sums into an (nx, ny) grid.

    One call covers all frames at once — the reference's per-frame loop
    (4_temporal_object_tracker.py:378-389) collapses into a single scatter.
    Returns (count (nx, ny) int32, intensity_sum (nx, ny) float32).
    """
    xi = digitize_clip(xy[:, 0], x_edges, nx)
    yi = digitize_clip(xy[:, 1], y_edges, ny)
    flat = xi * ny + yi
    flat = jnp.where(valid, flat, nx * ny)  # padded points scatter off-grid
    count = jnp.zeros((nx * ny + 1,), jnp.int32).at[flat].add(
        frame_occurrence_weight.astype(jnp.int32), mode="drop")
    isum = jnp.zeros((nx * ny + 1,), jnp.float32).at[flat].add(
        jnp.where(valid, intensity, 0.0), mode="drop")
    return count[:-1].reshape(nx, ny), isum[:-1].reshape(nx, ny)


@jax.jit
def land_mask_from_grids(
    count: jnp.ndarray,
    isum: jnp.ndarray,
    num_frames: jnp.ndarray,
    persistence_threshold: jnp.ndarray,
    min_intensity: jnp.ndarray,
) -> jnp.ndarray:
    """Cells occupied in >= persistence fraction of frames AND with average
    intensity >= min_intensity (4_temporal_object_tracker.py:394-410)."""
    persistence = count / jnp.maximum(num_frames, 1)
    avg = jnp.where(count > 0, isum / count, 0.0)
    return (persistence >= persistence_threshold) & (avg >= min_intensity)


@functools.partial(jax.jit, static_argnames=())
def land_keep_mask(
    xy: jnp.ndarray,
    valid: jnp.ndarray,
    land_mask: jnp.ndarray,  # (nx, ny) bool
    x_edges: jnp.ndarray,
    y_edges: jnp.ndarray,
) -> jnp.ndarray:
    """True for points whose grid cell is not land (padded points keep their
    validity as-is so downstream masks stay consistent)."""
    nx, ny = land_mask.shape
    xi = digitize_clip(xy[:, 0], x_edges, nx)
    yi = digitize_clip(xy[:, 1], y_edges, ny)
    return valid & ~land_mask[xi, yi]


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def land_filter_keep(
    xy: jnp.ndarray,  # (N, 2) padded points (all frames flattened)
    intensity: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    x_edges: jnp.ndarray,
    y_edges: jnp.ndarray,
    nx: int,
    ny: int,
    num_frames: jnp.ndarray,
    persistence_threshold: jnp.ndarray,
    min_intensity: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused occupancy + land mask + per-point keep.

    Composition of :func:`occupancy_grid`, :func:`land_mask_from_grids` and
    :func:`land_keep_mask` that digitizes each point ONCE (the separate
    calls each pay the 10M-point searchsorted twice) and looks the verdict
    up with a flat 1D gather.  Same values as the composition, ~2x faster
    at 10M points.  Returns (keep (N,) bool, land-cell count).
    """
    xi = digitize_clip(xy[:, 0], x_edges, nx)
    yi = digitize_clip(xy[:, 1], y_edges, ny)
    flat = xi * ny + yi
    off = jnp.where(valid, flat, nx * ny)  # padded points scatter off-grid
    count = jnp.zeros((nx * ny + 1,), jnp.int32).at[off].add(
        valid.astype(jnp.int32), mode="drop")[:-1]
    isum = jnp.zeros((nx * ny + 1,), jnp.float32).at[off].add(
        jnp.where(valid, intensity, 0.0), mode="drop")[:-1]
    persistence = count / jnp.maximum(num_frames, 1)
    avg = jnp.where(count > 0, isum / count, 0.0)
    land = (persistence >= persistence_threshold) & (avg >= min_intensity)
    keep = valid & ~jnp.take(land, flat)
    return keep, jnp.sum(land)


@functools.partial(jax.jit, static_argnames=("x_bins", "y_bins"))
def fuse_max_grid(
    x: jnp.ndarray,
    y: jnp.ndarray,
    intensity: jnp.ndarray,
    valid: jnp.ndarray,
    x_min: jnp.ndarray,
    y_min: jnp.ndarray,
    resolution: jnp.ndarray,
    x_bins: int,
    y_bins: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid max-pool fusion (5_gain_fusion_ply_builder.py:246-273).

    Returns (max_grid (x_bins, y_bins), keep (y-major flat bool mask of
    occupied cells)).  Cell centers + output ordering (y-major, matching the
    reference's transposed np.where) are reconstructed by the caller with
    :func:`max_grid_to_points`.
    """
    xi = ((x - x_min) / resolution).astype(jnp.int32)
    yi = ((y - y_min) / resolution).astype(jnp.int32)
    flat = xi * y_bins + yi
    flat = jnp.where(valid, flat, x_bins * y_bins)
    grid = jnp.zeros((x_bins * y_bins + 1,), jnp.float32).at[flat].max(
        jnp.where(valid, intensity, 0.0), mode="drop")
    grid = grid[:-1].reshape(x_bins, y_bins)
    keep_t = (grid.T > 0).reshape(-1)  # y-major traversal order
    return grid, keep_t


def max_grid_to_points(
    grid: np.ndarray,
    x_min: float,
    y_min: float,
    resolution: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract occupied cell centers in the reference's transposed-where
    order (5_gain_fusion_ply_builder.py:266-273)."""
    occ_y, occ_x = np.where(np.asarray(grid).T > 0)
    out_x = x_min + occ_x * resolution + resolution / 2
    out_y = y_min + occ_y * resolution + resolution / 2
    return out_x, out_y, np.asarray(grid)[occ_x, occ_y]
