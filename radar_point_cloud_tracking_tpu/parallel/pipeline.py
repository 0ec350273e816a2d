"""Multi-chip sharded pipeline step: frame-sharded fusion + land grid psum +
halo-exchanged distributed ST-DBSCAN + replicated tracking.

This is the framework's scaling path (the reference has no distributed
runtime at all — SURVEY §2.6).  Design:

- the frame axis shards over a 1D mesh; conversion/fusion need no
  communication;
- the persistence land grid is a per-shard scatter followed by one ``psum``
  over ICI, using the SAME np.arange bin edges as the single-chip path
  (ops/grid.py) so the land verdicts are bit-identical;
- ST-DBSCAN exploits its own temporal locality (|t_i - t_j| <= eps_time):
  each shard clusters its frames plus a +-eps_time frame halo exchanged with
  neighbors via ``ppermute`` (the closest analog to context parallelism);
  min-label propagation runs locally per sweep with halo label refresh +
  global ``psum`` convergence checks, and labels carry *global* point
  indices so canonical renumbering is a psum'd presence/rank table —
  bit-identical cluster ids to the single-chip engine;
- per-frame cluster centroids ``all_gather`` (tiny) and the sequential
  tracker scan runs replicated on every device; per-frame cluster stats
  return sharded so callers can assemble the same artifacts as the
  single-chip pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.cluster_stats import per_frame_cluster_stats
from ..ops.grid import digitize_clip
from ..ops.neighbors import INT_MAX, build_spatial_index, neighbor_core_stats, \
    neighbor_min_sweep, neighbor_min_sweep_gated
from ..ops.tracking import track_sequence
from .mesh import FRAMES_AXIS

__all__ = ["sharded_tracking_step"]


def _send_right(x, axis_name, n):
    """Shard i's value lands on shard i+1 (shard 0 receives zeros)."""
    return jax.lax.ppermute(x, axis_name,
                            perm=[(i, i + 1) for i in range(n - 1)])


def _send_left(x, axis_name, n):
    """Shard i's value lands on shard i-1 (last shard receives zeros)."""
    return jax.lax.ppermute(x, axis_name,
                            perm=[(i + 1, i) for i in range(n - 1)])


def _with_halo(local, axis_name, n, k):
    """Concatenate [left halo (k frames), local, right halo (k frames)]."""
    left = _send_right(local[-k:], axis_name, n)
    right = _send_left(local[:k], axis_name, n)
    return jnp.concatenate([left, local, right], axis=0)


def sharded_tracking_step(
    mesh: Mesh,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int = 1,
    border_mode: str = "always",
    land_grid_shape: Optional[Tuple[int, int]] = None,
    land_persistence: float = 0.8,
    land_min_intensity: float = 100.0,
    num_frames_real: int = 0,
    tile: int = 128,
    max_sweeps: int = 64,
    label_cap: int = 256,
    max_clusters: int = 32,
    max_objects: int = 64,
    history: int = 5,
    max_missed: int = 10,
    max_dist: float = 50.0,
    stationary: float = 1.0,
    k_pad: int = 128,
    with_tracking: bool = True,
):
    """Build the jitted sharded step.

    With ``land_grid_shape=(nx, ny)`` the step signature is
    ``step(xyi, count, frame_ids, x_edges, y_edges)`` and the persistence
    land filter runs with the caller's exact np.arange bin edges (same
    verdicts as the single-chip ``land_filter_keep``); with ``None`` the
    land filter is skipped and the signature is
    ``step(xyi, count, frame_ids)``.  ``xyi`` is (F, C, 3) sharded over
    frames; ``num_frames_real`` (default: the global padded frame count) is
    the persistence denominator — pass the real frame count when the
    sequence was padded to a multiple of the mesh size.

    Returns (labels (F, C) sharded, num_clusters, converged flag, final
    tracker state + records replicated, per-frame cluster stats dict with
    frame-sharded leaves + psum'd ``label_overflow``).  ``converged`` is
    False when min-label propagation hit ``max_sweeps`` before quiescing —
    labels may then split one cluster across shards, so callers must check
    it rather than trust the labeling silently.

    ``k_pad`` statically bounds the per-tile candidate-list width, keeping
    the spatial index O(num_tiles * k_pad) instead of the dense
    O(num_tiles^2) table a fully-traceable build would otherwise need.
    The TRUE per-shard candidate maximum returns in ``stats['max_cand']``
    (pmax over shards): when it exceeds ``k_pad`` the labeling may be
    wrong — callers must discard the results and rebuild with
    ``k_pad >= max_cand`` (models/tracker.py grow-and-retry does this;
    ``k_pad=0`` means unbounded, i.e. the dense table).
    """
    n_dev = mesh.devices.size
    halo_k = max(1, int(np.floor(eps_time)))
    n_offsets = int(np.floor(eps_time)) if min_frames > 1 else 0
    use_land = land_grid_shape is not None
    nx, ny = land_grid_shape if use_land else (1, 1)

    def body(xyi, count, frame_ids, *edges):
        ax = FRAMES_AXIS
        f_l, c, _ = xyi.shape
        shard = jax.lax.axis_index(ax)

        valid = jnp.arange(c)[None, :] < count[:, None]
        if num_frames_real:
            num_frames_g = jnp.int32(num_frames_real)
        else:
            num_frames_g = jax.lax.psum(jnp.int32(f_l), ax)

        # ---- land filter: local scatter + psum, exact-edge semantics -----
        if use_land:
            x_edges, y_edges = edges
            x = xyi[..., 0].reshape(-1)
            y = xyi[..., 1].reshape(-1)
            inten = xyi[..., 2].reshape(-1)
            v = valid.reshape(-1)
            xi = digitize_clip(x, x_edges, nx)
            yi = digitize_clip(y, y_edges, ny)
            cell = xi * ny + yi
            off = jnp.where(v, cell, nx * ny)
            cnt = jnp.zeros((nx * ny + 1,), jnp.int32).at[off].add(
                v.astype(jnp.int32), mode="drop")
            isum = jnp.zeros((nx * ny + 1,), jnp.float32).at[off].add(
                jnp.where(v, inten, 0.0), mode="drop")
            cnt = jax.lax.psum(cnt[:-1], ax)
            isum = jax.lax.psum(isum[:-1], ax)
            persistence = cnt / jnp.maximum(num_frames_g, 1)
            avg_i = jnp.where(cnt > 0, isum / cnt, 0.0)
            land = ((persistence >= land_persistence)
                    & (avg_i >= land_min_intensity))
            valid = (v & ~jnp.take(land, cell)).reshape(f_l, c)

        # ---- halo exchange of points ------------------------------------
        halo_xyi = _with_halo(xyi, ax, n_dev, halo_k)
        halo_valid = _with_halo(valid, ax, n_dev, halo_k)
        halo_fids = _with_halo(frame_ids[:, None].astype(jnp.float32),
                               ax, n_dev, halo_k)[:, 0]
        # zero-filled halos at the mesh edges are invalid
        edge_l = (shard == 0)
        edge_r = (shard == n_dev - 1)
        fmask = jnp.ones((f_l + 2 * halo_k,), bool)
        fmask = fmask.at[:halo_k].set(~edge_l)
        fmask = fmask.at[-halo_k:].set(~edge_r)
        halo_valid = halo_valid & fmask[:, None]

        ft = f_l + 2 * halo_k
        coords = halo_xyi[..., :2].reshape(ft * c, 2)
        times = jnp.broadcast_to(halo_fids[:, None], (ft, c)).reshape(-1)
        pvalid = halo_valid.reshape(-1)

        # global point index (frame-major over the global padded layout)
        gframe = (shard * f_l - halo_k
                  + jnp.arange(ft, dtype=jnp.int32))
        gidx = (gframe[:, None] * c
                + jnp.arange(c, dtype=jnp.int32)[None, :]).reshape(-1)

        index = build_spatial_index(coords, times, pvalid, eps_space,
                                    eps_time, tile=tile,
                                    k_pad=k_pad if k_pad > 0 else 1 << 30)
        es = jnp.float32(eps_space)
        et = jnp.float32(eps_time)

        # ---- core mask: local compute + halo exchange -------------------
        degree, frame_count = neighbor_core_stats(index, es, et,
                                                  n_offsets=n_offsets)
        core_sorted = index.valid & (degree >= min_samples)
        if min_frames > 1:
            core_sorted = core_sorted & (frame_count >= min_frames)
        # unsort to the (ft, c) layout
        nt = index.num_tiles * index.tile
        core_flat = jnp.zeros((ft * c,), bool).at[index.perm].set(
            core_sorted.reshape(-1)[:ft * c])
        core_frames = core_flat.reshape(ft, c)
        # owner-computed core flags for our own frames; halo flags refreshed
        local_core = core_frames[halo_k:halo_k + f_l]
        halo_core = _with_halo(local_core, ax, n_dev, halo_k)
        halo_core = halo_core & fmask[:, None] & halo_valid
        core_all = halo_core.reshape(-1)

        # ---- distributed min-label propagation --------------------------
        label0 = jnp.where(core_all, gidx, INT_MAX)

        def to_sorted(flat):
            s = flat[index.perm]
            if nt > ft * c:
                s = jnp.concatenate(
                    [s, jnp.full((nt - ft * c,), INT_MAX, flat.dtype)])
            return s.reshape(index.num_tiles, index.tile)

        def from_sorted(sorted2d):
            return jnp.zeros((ft * c,), sorted2d.dtype).at[index.perm].set(
                sorted2d.reshape(-1)[:ft * c])

        def sweep_min_gated(flat_labels, acc, tile_changed):
            """Incremental local sweep (ops/neighbors.py): rescan only
            candidates in tiles whose labels changed since the last round
            (halo refreshes included — the caller derives ``tile_changed``
            from the post-refresh labels), folding minima into the
            monotone accumulator ``acc`` (sorted space)."""
            payload = to_sorted(jnp.where(core_all, flat_labels, INT_MAX))
            acc2 = neighbor_min_sweep_gated(index, payload, es, et, acc,
                                            tile_changed)
            return from_sorted(acc2), acc2

        # labels are global point indices; any label pointing at a point
        # inside this shard's halo'd window can be chased locally (pointer
        # jumping), collapsing long in-shard chains geometrically instead of
        # one hop per sweep (plain sweeps needed ~41 rounds on clutter
        # chains in the single-chip engine — see ops/stdbscan.py)
        base = (shard * f_l - halo_k) * c

        def jump(lbl_flat):
            p = lbl_flat - base
            inb = (p >= 0) & (p < ft * c) & (lbl_flat < INT_MAX)
            tgt = jnp.where(inb, jnp.clip(p, 0, ft * c - 1), 0)
            return jnp.minimum(
                lbl_flat, jnp.where(inb, lbl_flat[tgt], lbl_flat))

        num_tiles_l = index.num_tiles

        def tiles_changed_of(new_flat, old_flat):
            # sorted-tile ids whose labels changed (halo refreshes land
            # here too, so their candidates rescan next round)
            diff = to_sorted(new_flat) != to_sorted(old_flat)
            return jnp.any(diff, axis=1)

        def loop_body(state):
            lbl, acc, tchanged, _, it = state
            nbr, acc2 = sweep_min_gated(lbl, acc, tchanged)
            merged = jnp.minimum(lbl, nbr)
            for _ in range(3):
                merged = jump(merged)
            new_local = merged.reshape(ft, c)[halo_k:halo_k + f_l]
            # owners re-broadcast fresh labels into neighbors' halos
            refreshed = _with_halo(new_local, ax, n_dev, halo_k)
            refreshed = jnp.where(halo_valid, refreshed, INT_MAX)
            new = jnp.where(core_all, refreshed.reshape(-1), INT_MAX)
            changed = jax.lax.psum(
                jnp.any(new != lbl).astype(jnp.int32), ax) > 0
            return new, acc2, tiles_changed_of(new, lbl), changed, it + 1

        def loop_cond(state):
            return state[3] & (state[4] < max_sweeps)

        acc0 = jnp.full((num_tiles_l, index.tile), INT_MAX, jnp.int32)
        label, acc_final, _, still_changing, _ = jax.lax.while_loop(
            loop_cond, loop_body,
            (label0, acc0, jnp.ones((num_tiles_l,), bool), jnp.bool_(True),
             jnp.int32(0)))
        converged = ~still_changing

        # ---- canonical ranks (global) -----------------------------------
        size = n_dev * f_l * c + 1  # static bound for n_global + 1
        local_mask = jnp.zeros((ft, c), bool).at[halo_k:halo_k + f_l].set(
            True).reshape(-1)
        presence = jnp.zeros((size,), jnp.int32).at[
            jnp.clip(jnp.where(local_mask & core_all, label, size - 1),
                     0, size - 1)].max(
            jnp.where(local_mask & core_all, 1, 0), mode="drop")
        # psum adds one count per shard holding the component; clamp back to
        # 0/1 before ranking
        presence = jnp.minimum(jax.lax.psum(presence, ax), 1)
        rank = jnp.cumsum(presence) - 1
        num_clusters = rank[size - 1] + 1 - presence[size - 1]

        # ---- border attachment ------------------------------------------
        if border_mode == "if_earlier":
            # denoiser scan-order semantics: clusters may only claim border
            # points scanned after their creation, except direct neighbors of
            # the cluster's root core (see ops/stdbscan.py)
            is_root = core_all & (label == gidx)
            payload = to_sorted(jnp.where(core_all, label, INT_MAX))
            border_key = from_sorted(neighbor_min_sweep(
                index, payload, es, et,
                query_limit=to_sorted(gidx),
                bypass_limit=to_sorted(is_root.astype(jnp.int32)) > 0,
                use_limit=True))
        else:
            # the accumulator at convergence IS the full sweep's neighbor
            # minimum over the final labels (monotone + every decrease
            # rescanned), i.e. exactly the "always" border key — no extra
            # full sweep needed
            border_key = from_sorted(acc_final)
        final_flat = jnp.where(
            core_all, rank[jnp.clip(label, 0, size - 1)],
            jnp.where(pvalid & (border_key < INT_MAX),
                      rank[jnp.clip(border_key, 0, size - 1)], -1))
        labels_local = final_flat.reshape(ft, c)[halo_k:halo_k + f_l]

        stats = {
            "keep": valid,  # post-land per-slot validity
            "kept_count": jnp.sum(valid, axis=1).astype(jnp.int32),
            "land_cells": (jnp.sum(land).astype(jnp.int32) if use_land
                           else jnp.int32(0)),
            # true candidate-width maximum across shards: > k_pad means the
            # bounded candidate table overflowed and the labels are invalid
            "max_cand": jax.lax.pmax(
                jnp.max(index.cand_count).astype(jnp.int32), ax),
        }
        if not with_tracking:
            # clustering-only consumers (the sharded denoiser) skip the
            # per-frame stats tables and the replicated tracker scan
            return labels_local, num_clusters, converged, None, None, stats

        # ---- per-frame cluster stats + gather ---------------------------
        lxy = xyi[..., :2].reshape(f_l * c, 2)
        lint = xyi[..., 2].reshape(-1)
        lframe = jnp.broadcast_to(
            jnp.arange(f_l, dtype=jnp.int32)[:, None], (f_l, c)).reshape(-1)
        cs = per_frame_cluster_stats(
            lxy, lint, lframe, labels_local.reshape(-1), valid.reshape(-1),
            num_frames=f_l, label_cap=label_cap, max_clusters=max_clusters)

        cents_g = jax.lax.all_gather(cs.centroids, ax, axis=0, tiled=True)
        cvalid_g = jax.lax.all_gather(cs.valid, ax, axis=0, tiled=True)
        fids_g = jax.lax.all_gather(frame_ids, ax, axis=0, tiled=True)

        # ---- replicated tracker scan ------------------------------------
        state, records = track_sequence(
            cents_g, cvalid_g, fids_g, max_objects=max_objects,
            history=history, max_missed=max_missed, max_dist=max_dist,
            stationary=stationary)
        stats.update({
            "centroids": cs.centroids,
            "valid": cs.valid,
            "label": cs.label,
            "num_points": cs.num_points,
            "mean_intensity": cs.mean_intensity,
            "present_count": cs.present_count,
            "label_overflow": jax.lax.psum(cs.label_overflow, ax),
        })
        return labels_local, num_clusters, converged, state, records, stats

    shard_spec = P(FRAMES_AXIS)
    in_specs = [shard_spec, shard_spec, shard_spec]
    if use_land:
        in_specs += [P(), P()]  # bin edges replicated
    stats_specs = {
        "keep": shard_spec, "kept_count": shard_spec,
        "land_cells": P(), "max_cand": P(),
    }
    if with_tracking:
        stats_specs.update({
            "centroids": shard_spec, "valid": shard_spec,
            "label": shard_spec, "num_points": shard_spec,
            "mean_intensity": shard_spec, "present_count": shard_spec,
            "label_overflow": P(),
        })
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(shard_spec, P(), P(),
                   P() if with_tracking else None,
                   P() if with_tracking else None, stats_specs),
        check_vma=False,
    )
    return jax.jit(sharded)
