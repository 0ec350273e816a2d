"""Device object tracker: Hungarian association + velocity state + buoy/boat
classification as one ``lax.scan`` over the frame sequence.

Reimplements the reference ``ObjectTracker``
(4_temporal_object_tracker.py:543-688) with a fixed-capacity object table so
the whole sequence tracks on device without host round-trips:

- association: device Jonker-Volgenant (ops/hungarian.py) on a padded
  square cost matrix of distances to velocity-predicted positions;
- gating at ``max_association_distance``; unmatched clusters allocate free
  slots with sequential ids (creation order = cluster order, matching the
  reference loop at :604-607);
- velocity history as a ring buffer; classification after
  ``motion_history_frames`` samples: mean speed below
  ``stationary_velocity_threshold`` -> buoy else boat (:642-652);
- objects missing longer than ``max_missed_frames`` are deleted and excluded
  from the final outputs (:654-663) — ids are never reused.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackingConfig
from .hungarian import solve_lsa

__all__ = ["TrackerState", "init_tracker_state", "tracker_step",
           "track_sequence", "grow_state", "grow_records",
           "pack_state_with", "unpack_state",
           "TYPE_UNKNOWN", "TYPE_BUOY", "TYPE_BOAT"]

TYPE_UNKNOWN = 0
TYPE_BUOY = 1
TYPE_BOAT = 2

_BIG = np.float32(1e6)


class TrackerState(NamedTuple):
    active: jnp.ndarray  # (O,) bool
    object_id: jnp.ndarray  # (O,) int32
    last_pos: jnp.ndarray  # (O, 2) f32
    last_seen: jnp.ndarray  # (O,) int32
    first_frame: jnp.ndarray  # (O,) int32
    frames_seen: jnp.ndarray  # (O,) int32
    vel_ring: jnp.ndarray  # (O, H, 2) f32
    vel_count: jnp.ndarray  # (O,) int32  (len(velocities) in the reference)
    type_code: jnp.ndarray  # (O,) int32
    next_id: jnp.ndarray  # () int32


def init_tracker_state(max_objects: int, history: int) -> TrackerState:
    o, h = max_objects, history
    return TrackerState(
        active=jnp.zeros((o,), bool),
        object_id=jnp.zeros((o,), jnp.int32),
        last_pos=jnp.zeros((o, 2), jnp.float32),
        last_seen=jnp.zeros((o,), jnp.int32),
        first_frame=jnp.zeros((o,), jnp.int32),
        frames_seen=jnp.zeros((o,), jnp.int32),
        vel_ring=jnp.zeros((o, h, 2), jnp.float32),
        vel_count=jnp.zeros((o,), jnp.int32),
        type_code=jnp.zeros((o,), jnp.int32),
        next_id=jnp.int32(1),
    )


def _recent_vel_stats(vel_ring, vel_count, history):
    """Mean velocity vector and mean speed over the last
    min(vel_count, history) entries (reference velocities[-H:])."""
    h = vel_ring.shape[-2]
    slots = jnp.arange(h)
    valid = slots[None, :] < jnp.minimum(vel_count, history)[:, None]
    denom = jnp.maximum(jnp.sum(valid, axis=1), 1).astype(jnp.float32)
    mean_vel = jnp.sum(jnp.where(valid[..., None], vel_ring, 0.0), axis=1)
    mean_vel = mean_vel / denom[:, None]
    speeds = jnp.linalg.norm(vel_ring, axis=-1)
    mean_speed = jnp.sum(jnp.where(valid, speeds, 0.0), axis=1) / denom
    # reference average_velocity returns 0 when len(velocities) < 2
    mean_speed = jnp.where(vel_count >= 2, mean_speed, 0.0)
    return mean_vel, mean_speed


def _last_k_vel_stats(vel_ring, vel_count, k):
    """Mean velocity over the k most recently appended ring entries
    (reference ``velocities[-k:]``, 4_temporal_object_tracker.py:751).

    ``_recent_vel_stats``'s slot mask is only valid when the window equals
    the ring size; here entries are selected by age relative to the write
    cursor so the *last* k survive, not the first k slots."""
    h = vel_ring.shape[-2]
    slots = jnp.arange(h)
    ring_pos = vel_count % h  # next write position
    age = (ring_pos[:, None] - 1 - slots[None, :]) % h
    valid = age < jnp.minimum(vel_count, k)[:, None]
    denom = jnp.maximum(jnp.sum(valid, axis=1), 1).astype(jnp.float32)
    mean_vel = jnp.sum(jnp.where(valid[..., None], vel_ring, 0.0), axis=1)
    return mean_vel / denom[:, None]


def _classify(vel_count, mean_speed, cfg_history, stationary_thresh):
    return jnp.where(
        vel_count < cfg_history,
        TYPE_UNKNOWN,
        jnp.where(mean_speed < stationary_thresh, TYPE_BUOY, TYPE_BOAT))


@functools.partial(jax.jit, static_argnames=("history", "max_missed",
                                             "max_dist", "stationary",))
def tracker_step(
    state: TrackerState,
    centroids: jnp.ndarray,  # (C, 2)
    cluster_valid: jnp.ndarray,  # (C,)
    frame_id: jnp.ndarray,  # () int32
    history: int,
    max_missed: int,
    max_dist: float,
    stationary: float,
):
    """One tracker update; returns (new_state, per-frame observation record)."""
    o = state.active.shape[0]
    c = centroids.shape[0]
    s = max(o, c)
    h = history

    num_clusters = jnp.sum(cluster_valid)
    has_objects = jnp.any(state.active)
    active_mask = state.active & (frame_id - state.last_seen <= max_missed)
    do_assoc = (num_clusters > 0) & has_objects & jnp.any(active_mask)

    # ---- predicted positions & cost matrix ------------------------------
    mean_vel, mean_speed = _recent_vel_stats(state.vel_ring, state.vel_count, h)
    frames_ahead = (frame_id - state.last_seen).astype(jnp.float32)
    predicted = state.last_pos + mean_vel * frames_ahead[:, None]

    diff = centroids[:, None, :] - predicted[None, :, :]
    cost = jnp.linalg.norm(diff, axis=-1)
    cost = jnp.where(cluster_valid[:, None] & active_mask[None, :], cost, _BIG)
    cost_sq = jnp.full((s, s), _BIG, jnp.float32).at[:c, :o].set(cost)

    # clusters are compacted valid-first, so restricting the augmenting loop
    # to num_clusters rows solves the rectangular problem like scipy at cost
    # proportional to the actual detection count; when no association can
    # happen (no clusters or no live objects) the solver runs zero rows
    row_of_col = solve_lsa(
        cost_sq, jnp.where(do_assoc, num_clusters, 0).astype(jnp.int32))

    obj_cluster = row_of_col[:o]
    pair_cost = cost_sq[jnp.clip(obj_cluster, 0, s - 1), jnp.arange(o)]
    matched_obj = (do_assoc & active_mask & (obj_cluster >= 0)
                   & (obj_cluster < c) & (pair_cost <= max_dist))
    matched_obj = matched_obj & cluster_valid[jnp.clip(obj_cluster, 0, c - 1)]

    cluster_assigned = jnp.zeros((c,), bool).at[
        jnp.where(matched_obj, obj_cluster, c)].set(True, mode="drop")

    # ---- update matched objects ----------------------------------------
    matched_centroid = centroids[jnp.clip(obj_cluster, 0, c - 1)]
    elapsed = (frame_id - state.last_seen).astype(jnp.float32)
    velocity = (matched_centroid - state.last_pos) / jnp.maximum(elapsed, 1.0)[:, None]
    append_vel = matched_obj & (elapsed > 0)

    ring_pos = state.vel_count % h
    new_ring = jnp.where(
        append_vel[:, None, None],
        state.vel_ring.at[jnp.arange(o), ring_pos].set(velocity),
        state.vel_ring)
    new_vel_count = state.vel_count + append_vel.astype(jnp.int32)

    new_last_pos = jnp.where(matched_obj[:, None], matched_centroid,
                             state.last_pos)
    new_last_seen = jnp.where(matched_obj, frame_id, state.last_seen)
    new_frames_seen = state.frames_seen + matched_obj.astype(jnp.int32)

    _, new_mean_speed = _recent_vel_stats(new_ring, new_vel_count, h)
    new_type = jnp.where(
        matched_obj,
        _classify(new_vel_count, new_mean_speed, h, stationary),
        state.type_code)

    # ---- create objects for unmatched clusters -------------------------
    create_mask = cluster_valid & ~cluster_assigned  # (c,)
    created_rank = jnp.cumsum(create_mask.astype(jnp.int32)) - 1
    free_mask = ~state.active
    free_rank = jnp.cumsum(free_mask.astype(jnp.int32)) - 1
    # slot_list[r] = r-th free slot
    slot_list = jnp.full((o + 1,), o, jnp.int32).at[
        jnp.where(free_mask, free_rank, o)].set(jnp.arange(o, dtype=jnp.int32),
                                                mode="drop")
    num_free = jnp.sum(free_mask)
    can_create = create_mask & (created_rank < num_free)
    target_slot = slot_list[jnp.clip(created_rank, 0, o)]  # (c,)
    target_slot = jnp.where(can_create, target_slot, o)

    # scatter creations into object slots
    new_ids = state.next_id + created_rank.astype(jnp.int32)
    active2 = state.active.at[target_slot].set(True, mode="drop")
    object_id2 = state.object_id.at[target_slot].set(new_ids, mode="drop")
    last_pos2 = new_last_pos.at[target_slot].set(centroids, mode="drop")
    last_seen2 = new_last_seen.at[target_slot].set(frame_id, mode="drop")
    first_frame2 = state.first_frame.at[target_slot].set(frame_id, mode="drop")
    frames_seen2 = new_frames_seen.at[target_slot].set(1, mode="drop")
    # creation seeds the velocity history with a zero vector (:619)
    ring2 = new_ring.at[target_slot].set(jnp.zeros((c, h, 2)), mode="drop")
    vel_count2 = new_vel_count.at[target_slot].set(1, mode="drop")
    type2 = new_type.at[target_slot].set(TYPE_UNKNOWN, mode="drop")
    num_created = jnp.sum(can_create).astype(jnp.int32)

    # ---- cleanup lost objects ------------------------------------------
    stale = active2 & (frame_id - last_seen2 > max_missed)
    active3 = active2 & ~stale

    new_state = TrackerState(
        active=active3,
        object_id=object_id2,
        last_pos=last_pos2,
        last_seen=last_seen2,
        first_frame=first_frame2,
        frames_seen=frames_seen2,
        vel_ring=ring2,
        vel_count=vel_count2,
        type_code=type2,
        next_id=state.next_id + num_created,
    )

    seen_now = matched_obj.at[target_slot].set(True, mode="drop")
    # mean of the last 3 velocities drives the viz arrows
    # (4_temporal_object_tracker.py:751)
    vel3 = _last_k_vel_stats(ring2, vel_count2, 3)
    # clusters that wanted a new object but found no free slot: the reference
    # tracker is unbounded, so any drop here means the fixed table is too
    # small — callers check this count and grow max_objects (never silent)
    num_dropped = (jnp.sum(create_mask) - num_created).astype(jnp.int32)
    record = {
        "object_id": object_id2,
        "seen": seen_now & active3,
        "pos": last_pos2,
        "active": active3,
        "vel": vel3,
        "dropped": num_dropped,
    }
    return new_state, record


@functools.partial(jax.jit, static_argnames=("history", "max_missed",
                                             "max_dist", "stationary"))
def _track_scan(
    state0: TrackerState,
    centroids: jnp.ndarray,  # (F, C, 2)
    cluster_valid: jnp.ndarray,  # (F, C) bool
    frame_ids: jnp.ndarray,  # (F,) int32
    history: int,
    max_missed: int,
    max_dist: float,
    stationary: float,
) -> Tuple[TrackerState, dict]:
    def step(state, inputs):
        cents, cvalid, fid = inputs
        return tracker_step(state, cents, cvalid, fid, history, max_missed,
                            max_dist, stationary)

    return jax.lax.scan(step, state0, (centroids, cluster_valid, frame_ids))


def track_sequence(
    centroids: jnp.ndarray,  # (F, C, 2)
    cluster_valid: jnp.ndarray,  # (F, C) bool
    frame_ids: jnp.ndarray,  # (F,) int32
    max_objects: int,
    history: int,
    max_missed: int,
    max_dist: float,
    stationary: float,
    init_state: TrackerState | None = None,
) -> Tuple[TrackerState, dict]:
    """Track a frame sequence in one scan.

    ``init_state`` resumes from a prior state (checkpoint/resume and chunked
    tracking); the state transition is Markovian over absolute frame ids, so
    scanning frames ``[0, k)`` then ``[k, F)`` with the carried state is
    bit-identical to one ``[0, F)`` scan (tests/test_checkpoint.py).

    Returns (final state, per-frame records stacked along axis 0).
    """
    if init_state is None:
        init_state = init_tracker_state(max_objects, history)
    return _track_scan(init_state, centroids, cluster_valid, frame_ids,
                       history, max_missed, max_dist, stationary)


def grow_state(state: TrackerState, new_max_objects: int) -> TrackerState:
    """Pad the object table to ``new_max_objects`` slots (new slots inactive).

    Slot assignment ranks free slots in index order, so extending the table
    with trailing free slots never changes which slot an existing creation
    takes — results are padding-invariant while the smaller table never
    overflowed (the grow-and-retry contract in models/tracker.py)."""
    o = state.active.shape[0]
    extra = new_max_objects - o
    if extra <= 0:
        return state

    def pad(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:  # next_id
            return leaf
        return jnp.concatenate(
            [leaf, jnp.zeros((extra,) + leaf.shape[1:], leaf.dtype)])

    return TrackerState(*[pad(leaf) for leaf in state])


def grow_records(records: dict, new_max_objects: int) -> dict:
    """Pad per-frame record leaves from (F, O, ...) to (F, new_O, ...)."""
    out = {}
    for k, v in records.items():
        v = np.asarray(v)
        if v.ndim >= 2 and k != "dropped":
            extra = new_max_objects - v.shape[1]
            if extra > 0:
                pad = np.zeros((v.shape[0], extra) + v.shape[2:], v.dtype)
                v = np.concatenate([v, pad], axis=1)
        out[k] = v
    return out


@jax.jit
def pack_state_with(state: TrackerState, extra: jnp.ndarray) -> jnp.ndarray:
    """Bitcast-pack every state leaf plus ``extra`` int32 scalars into one
    int32 vector.  A d2h transfer through the device tunnel costs ~30 ms
    flat regardless of size, so pulling the ten state leaves individually
    costs ~10x what one packed pull does; the host inverse is
    :func:`unpack_state`."""
    def enc(a):
        a = a.reshape(-1)
        if a.dtype == jnp.float32:
            return jax.lax.bitcast_convert_type(a, jnp.int32)
        return a.astype(jnp.int32)

    return jnp.concatenate([enc(extra)] + [enc(leaf) for leaf in state])


def unpack_state(buf: np.ndarray, max_objects: int, history: int,
                 n_extra: int) -> Tuple[np.ndarray, TrackerState]:
    """Host inverse of :func:`pack_state_with` (numpy leaves)."""
    buf = np.asarray(buf, dtype=np.int32)
    o, h = max_objects, history
    extra = buf[:n_extra]
    off = [n_extra]

    def take(n, shape, dtype):
        part = buf[off[0]:off[0] + n]
        off[0] += n
        if dtype == np.float32:
            return part.view(np.float32).reshape(shape)
        if dtype is bool:
            return part.astype(bool).reshape(shape)
        return part.reshape(shape)

    state = TrackerState(
        active=take(o, (o,), bool),
        object_id=take(o, (o,), np.int32),
        last_pos=take(o * 2, (o, 2), np.float32),
        last_seen=take(o, (o,), np.int32),
        first_frame=take(o, (o,), np.int32),
        frames_seen=take(o, (o,), np.int32),
        vel_ring=take(o * h * 2, (o, h, 2), np.float32),
        vel_count=take(o, (o,), np.int32),
        type_code=take(o, (o,), np.int32),
        next_id=take(1, (), np.int32),
    )
    return extra, state


def track_sequence_host(
    centroids_list,
    frame_ids,
    config: TrackingConfig,
):
    """Host convenience: list of (C_i, 2) centroid arrays -> final state +
    records as NumPy."""
    f = len(centroids_list)
    c = max(config.max_clusters_per_frame,
            max((len(x) for x in centroids_list), default=1))
    cents = np.zeros((f, c, 2), np.float32)
    valid = np.zeros((f, c), bool)
    for i, arr in enumerate(centroids_list):
        arr = np.asarray(arr, np.float32).reshape(-1, 2)
        cents[i, :len(arr)] = arr
        valid[i, :len(arr)] = True
    state, records = track_sequence(
        jnp.asarray(cents), jnp.asarray(valid),
        jnp.asarray(np.asarray(frame_ids, np.int32)),
        max_objects=config.max_objects,
        history=config.motion_history_frames,
        max_missed=config.max_missed_frames,
        max_dist=config.max_association_distance,
        stationary=config.stationary_velocity_threshold,
    )
    state = jax.tree_util.tree_map(np.asarray, state)
    records = jax.tree_util.tree_map(np.asarray, records)
    return state, records
